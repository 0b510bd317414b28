"""Compat boundary round-trips: native <-> reference schema."""

import datetime as dt

from bike_analyzer_spark.sources import compat, gbfs
from tests.test_sources import SI, SS

def test_stations_roundtrip(spark):
    native = gbfs.stations_df(spark, SI)
    ref = compat.to_reference_stations(native)
    row = {r.station_id: r for r in ref.collect()}
    assert row["s1"].rental_methods == "KEY,PHONE"
    assert row["s1"].is_virtual_station == 0
    assert row["s1"].last_updated == 1756998511
    back = compat.from_reference_stations(ref)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, native.collect()))

def test_status_roundtrip(spark):
    ts = dt.datetime(2025, 9, 4, 15, 8, 40)
    native = gbfs.status_df(spark, SS, ts)
    ref = compat.to_reference_status(native)
    row = {r.station_id: r for r in ref.collect()}
    assert row["s1"].vehicles_json == (
        '[{"vehicle_type_id":"FIT","count":0},'
        '{"vehicle_type_id":"ELETRIC","count":5}]')
    assert row["s1"].is_renting == 1 and row["s2"].vehicles_json is None
    # reference scraped_at is ISO-8601 with offset (etl_gbfs.py:15-16)
    assert row["s1"].scraped_at == "2025-09-04T15:08:40+00:00"
    back = compat.from_reference_status(ref)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, native.collect()))

def test_empty_rental_methods_roundtrip(spark):
    """'' (known-empty) and NULL (unknown) must stay distinct through
    the boundary: [] -> '' -> [], NULL -> NULL -> NULL."""
    native = spark.createDataFrame(
        [("s1", [], ), ("s2", None)],
        "station_id string, rental_methods array<string>",
    ).selectExpr(
        "station_id", "cast(null as string) name", "cast(null as double) lat",
        "cast(null as double) lon", "cast(null as int) capacity",
        "cast(null as string) address", "rental_methods",
        "cast(null as boolean) is_virtual_station",
        "cast(null as string) external_id", "cast(null as string) short_name",
        "cast(null as string) region_id",
        "cast(null as timestamp) last_updated",
    )
    back = compat.from_reference_stations(compat.to_reference_stations(native))
    got = {r.station_id: r.rental_methods for r in back.collect()}
    assert got == {"s1": [], "s2": None}
