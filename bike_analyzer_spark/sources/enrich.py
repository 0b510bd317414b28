"""Slow-enrichment pattern — throttled per-row lookups cached as a
dimension table (SURVEY.md §2.1 S12/S13, §2.10 U3; reference
streamlit_app.py:80-119 Nominatim reverse-geocoding with a 1 req/s
sleep and a CSV cache).

Spark shape: the lookup runs inside mapInPandas with a per-row
throttle — executors make the calls in parallel PER PARTITION, so the
effective global rate is (partitions x 1/rate); coalesce(1) for a
strict global limit, repartition(n) to spend a higher quota. The
result is persisted once (S12) and afterwards joins as a small
broadcast dimension — the expensive path never re-runs (the reference
re-reads its CSV the same way, streamlit_app.py:82-84).

The geocoder itself is injectable: a Callable[(lat, lon) -> address
dict]. The engine ships no HTTP client here — at scale this would be
an offline enrichment job against a geocoding dataset anyway.
Per-row failures yield NULL bairro (reference swallows per-row
exceptions at :112-113).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEO_SCHEMA = "station_id string, bairro string, lat double, lon double"

# first-non-null of five address keys (reference streamlit_app.py:104-111)
BAIRRO_KEYS = ("neighbourhood", "suburb", "quarter", "city_district", "district")


def extract_bairro(addr: dict | None) -> str | None:
    if not addr:
        return None
    for k in BAIRRO_KEYS:
        v = addr.get(k)
        if v:
            return v
    return None


def geocode_stations(
    stations: DataFrame,
    geocoder: Callable[[float, float], dict | None],
    rate_limit_s: float = 0.0,
) -> DataFrame:
    """U3: per-row reverse geocode with throttle; exceptions -> NULL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bairros = []
            for lat, lon in zip(pdf["lat"], pdf["lon"]):
                if rate_limit_s:
                    time.sleep(rate_limit_s)
                try:
                    bairros.append(extract_bairro(geocoder(lat, lon)))
                except Exception:
                    bairros.append(None)
            yield pd.DataFrame(
                {
                    "station_id": pdf["station_id"].to_numpy(),
                    "bairro": bairros,
                    "lat": pdf["lat"].to_numpy(),
                    "lon": pdf["lon"].to_numpy(),
                }
            )

    cols = stations.select("station_id", "lat", "lon").filter(
        F.col("lat").isNotNull() & F.col("lon").isNotNull()
    )
    return cols.mapInPandas(run, GEO_SCHEMA)


def cached_geocode(
    spark: SparkSession,
    stations: DataFrame,
    cache_path: str,
    geocoder: Callable[[float, float], dict | None],
    rate_limit_s: float = 0.0,
) -> DataFrame:
    """S12/S13: read the cache table if present, else geocode once and
    persist (CSV, matching the reference's cache artifact)."""
    if os.path.exists(cache_path):
        return (
            spark.read.option("header", True)
            .schema(GEO_SCHEMA)
            .csv(cache_path)
        )
    out = geocode_stations(stations, geocoder, rate_limit_s)
    out.write.mode("overwrite").option("header", True).csv(cache_path)
    return (
        spark.read.option("header", True).schema(GEO_SCHEMA).csv(cache_path)
    )
