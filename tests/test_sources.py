"""GBFS + weather source layer: payload parsing, feed selection,
ingest composition — fixture payloads, no network."""

import datetime as dt
import os, shutil, uuid

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.sources import gbfs, weather

SI = {
    "last_updated": 1756998511,
    "data": {"stations": [
        {"station_id": "s1", "name": "Praça A", "lat": -30.03, "lon": -51.21,
         "capacity": 12, "rental_methods": ["KEY", "PHONE"],
         "is_virtual_station": 0},
        {"station_id": "s2", "name": "Praça B", "lat": -30.05, "lon": -51.23},
    ]},
}
SS = {
    "data": {"stations": [
        {"station_id": "s1", "num_bikes_available": 5, "num_docks_available": 7,
         "is_installed": 1, "is_renting": 1, "is_returning": 1,
         "last_reported": 1756998511,
         "vehicle_types_available": [{"vehicle_type_id": "FIT", "count": 0},
                                      {"vehicle_type_id": "ELETRIC", "count": 5}]},
        {"station_id": "s2", "num_bikes_available": 2},
    ]},
}

@pytest.fixture()
def wh():
    d = f"/root/repo/.pytest_cache/wh-{uuid.uuid4().hex[:8]}"
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)

def test_feed_selection_language_preference():
    feeds = [
        {"name": "station_information", "language": "pt", "url": "u-pt"},
        {"name": "station_information", "language": "en", "url": "u-en"},
        {"name": "station_status", "language": "pt-BR", "url": "s-ptbr"},
        {"name": "other", "language": "", "url": "x"},
    ]
    assert gbfs.pick_feed_url(feeds, "station_information") == "u-en"
    assert gbfs.pick_feed_url(feeds, "station_status") == "s-ptbr"
    assert gbfs.pick_feed_url(feeds, "missing") is None

def test_discover_feeds_shapes():
    flat = {"data": {"feeds": [{"name": "a", "url": "u"}]}}
    nested = {"data": {"en": {"feeds": [{"name": "a", "url": "u"}]}}}
    assert gbfs.discover_feeds(flat) == gbfs.discover_feeds(nested)
    with pytest.raises(RuntimeError):
        gbfs.discover_feeds({"data": {}})

def test_stations_df_types(spark):
    df = gbfs.stations_df(spark, SI)
    rows = {r.station_id: r for r in df.collect()}
    assert rows["s1"].rental_methods == ["KEY", "PHONE"]
    assert rows["s1"].is_virtual_station is False
    assert rows["s2"].capacity is None
    assert rows["s1"].last_updated == dt.datetime.fromtimestamp(1756998511, tz=dt.timezone.utc).replace(tzinfo=None)

def test_status_df_vehicles_struct(spark):
    ts = dt.datetime(2025, 9, 4, 15, 8, 40)
    df = gbfs.status_df(spark, SS, ts)
    rows = {r.station_id: r for r in df.collect()}
    assert rows["s1"].vehicles[1].asDict() == {"vehicle_type_id": "ELETRIC", "count": 5}
    assert rows["s2"].vehicles is None
    assert all(r.scraped_at == ts for r in rows.values())

def test_ingest_once_composite(spark, wh):
    ts = dt.datetime(2025, 9, 4, 15, 8, 40)
    out = gbfs.ingest_once(spark, wh, fetch_fn=lambda: (SI, SS), now=ts)
    assert out == {"stations_upserted": 2, "status_rows": 2}
    # second poll: same stations (upsert no-op), status rows append
    out2 = gbfs.ingest_once(
        spark, wh, fetch_fn=lambda: (SI, SS), now=ts + dt.timedelta(minutes=10))
    assert out2 == {"stations_upserted": 2, "status_rows": 2}
    status = spark.read.parquet(os.path.join(wh, "station_status.parquet"))
    assert status.count() == 4

WEATHER = {
    "hourly": {
        "time": ["2025-09-04T00:00", "2025-09-04T01:00"],
        "temperature_2m": [21.5, 20.9],
        "weathercode": [3, 61],
        # precipitation etc. absent -> null-filled
    }
}

def test_weather_unzip_nullfill(spark):
    df = weather.weather_df(spark, WEATHER)
    rows = sorted(df.collect(), key=lambda r: r.time)
    assert len(rows) == 2
    assert rows[0].temperature_2m == 21.5 and rows[0].weathercode == 3
    assert rows[0].precipitation is None and rows[1].rain is None

def test_weather_upsert_newer_wins(spark, wh):
    t0 = dt.datetime(2025, 9, 4, 12, 0, 0)
    assert weather.upsert_weather(spark, WEATHER, wh, ingested_at=t0) == 2
    corrected = {"hourly": {"time": ["2025-09-04T01:00"],
                            "temperature_2m": [19.0], "weathercode": [95]}}
    assert weather.upsert_weather(
        spark, corrected, wh, ingested_at=t0 + dt.timedelta(hours=1)) == 2
    back = spark.read.parquet(os.path.join(wh, "weather_hourly.parquet"))
    got = {r.time: r.temperature_2m for r in back.collect()}
    assert got[dt.datetime(2025, 9, 4, 1, 0)] == 19.0
    assert got[dt.datetime(2025, 9, 4, 0, 0)] == 21.5

def test_parse_rel():
    now = dt.datetime(2025, 9, 4, tzinfo=dt.timezone.utc)
    assert weather.parse_rel("-2d", now) == now - dt.timedelta(days=2)
    assert weather.parse_rel("+2d", now) == now + dt.timedelta(days=2)
    assert weather.parse_rel("2025-01-31").date().isoformat() == "2025-01-31"
