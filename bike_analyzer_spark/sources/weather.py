"""Open-Meteo weather source (SURVEY.md §2.1 S7/S8; reference
etl_weather.py).

The payload is a struct of PARALLEL ARRAYS (hourly.time[] plus one
array per metric). The reference unzips row-by-row in Python
(etl_weather.py:45-75); the Spark-native unzip is arrays_zip +
explode — one expression, executed columnar, and the null-filling of
absent metric arrays (reference `:49`) becomes a coalesce with
array_repeat(NULL).

Upsert keyed on `time` (PK in sql/schema.sql:36) via the shared
keep-latest merge; `ingested_at` is the deterministic recency order so
re-ingesting a corrected forecast wins, replaying an old batch loses.
"""

from __future__ import annotations

import datetime as _dt
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import sinks

# reference config.py:10-22 WEATHER_HOURLY_PARAMS
METRICS = [
    ("temperature_2m", "double"),
    ("precipitation", "double"),
    ("rain", "double"),
    ("showers", "double"),
    ("snowfall", "double"),
    ("cloudcover", "double"),
    ("windspeed_10m", "double"),
    ("relative_humidity_2m", "double"),
    ("weathercode", "int"),
]

_PAYLOAD_SCHEMA = T.StructType(
    [T.StructField("time", T.ArrayType(T.StringType()))]
    + [
        T.StructField(
            name,
            T.ArrayType(
                T.IntegerType() if typ == "int" else T.DoubleType()
            ),
        )
        for name, typ in METRICS
    ]
)


def parse_rel(s: str, now: _dt.datetime | None = None) -> _dt.datetime:
    """F14 (reference etl_weather.py:14-20): '+2d'/'-2d' relative or
    ISO-8601 absolute. Driver-side arg parsing, stdlib only."""
    s = s.strip()
    now = now or _dt.datetime.now(_dt.timezone.utc)
    if s.endswith("d") and s[:1] in "+-":
        return now + _dt.timedelta(days=int(s[:-1]))
    return _dt.datetime.fromisoformat(s)


#: public Open-Meteo endpoint + Porto Alegre coords (reference
#: config.py:7-9, etl_weather.py:34)
DEFAULT_API = "https://api.open-meteo.com/v1/forecast"
CITY_LAT, CITY_LON = -30.0346, -51.2177
TIMEZONE = "America/Sao_Paulo"


def fetch_weather(
    start: str, end: str, api_url: str = DEFAULT_API
) -> dict[str, Any]:
    """S7: fetch the hourly forecast for the city window (reference
    etl_weather.py:23-36). Import-gated on `requests`; tests inject
    payload fixtures into weather_df/upsert_weather directly."""
    import requests

    params = {
        "latitude": CITY_LAT,
        "longitude": CITY_LON,
        "timezone": TIMEZONE,
        "start_date": parse_rel(start).date().isoformat(),
        "end_date": parse_rel(end).date().isoformat(),
        "hourly": ",".join(name for name, _ in METRICS),
    }
    r = requests.get(api_url, params=params, timeout=30)
    r.raise_for_status()
    return r.json()


def weather_df(spark: SparkSession, payload: dict[str, Any]) -> DataFrame:
    """hourly struct-of-arrays -> one typed row per hour."""
    hourly = payload.get("hourly", {})
    row = {"time": hourly.get("time", [])}
    for name, _ in METRICS:
        row[name] = hourly.get(name)
    df = spark.createDataFrame([row], _PAYLOAD_SCHEMA)
    n = F.size("time")
    filled = [
        F.coalesce(
            F.col(name),
            F.array_repeat(F.lit(None).cast(typ), n),
        ).alias(name)
        for name, typ in METRICS
    ]
    zipped = df.select(
        F.explode(F.arrays_zip(F.col("time"), *filled)).alias("z")
    )
    return zipped.select(
        F.to_timestamp(F.col("z.time")).alias("time"),
        *[F.col(f"z.{name}").alias(name) for name, _ in METRICS],
    )


def upsert_weather(
    spark: SparkSession,
    payload: dict[str, Any],
    warehouse: str,
    ingested_at: _dt.datetime | None = None,
) -> int:
    """S8: unzip + keep-latest upsert on `time` (reference
    etl_weather.py:60-69's ON CONFLICT DO UPDATE)."""
    ts = ingested_at or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    df = weather_df(spark, payload).withColumn(
        "ingested_at", F.lit(ts).cast("timestamp")
    )
    return sinks.merge_upsert(
        spark,
        df,
        os.path.join(warehouse, "weather_hourly.parquet"),
        ["time"],
        "ingested_at",
    )
