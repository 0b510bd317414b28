"""SQLite-compat boundary — project the engine's Spark-native frames
into the reference's exact storage schema (sql/schema.sql:3-32) for
drop-in interchange: the reference flattens rich types at WRITE time
(etl_gbfs.py:104 `",".join(rental_methods)`, :123-125 `json.dumps`
vehicles, :105 `int(bool(...))`); this engine keeps them native and
flattens only here, at the boundary.

Round-trips losslessly: `to_reference_stations/status` compose with
`from_reference_*` to recover the native frames (tested)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import VEHICLE_TYPE


def to_reference_stations(stations: DataFrame) -> DataFrame:
    """Native stations -> reference schema: array->CSV (F11),
    bool->0/1 (F10), timestamp->epoch seconds."""
    return stations.select(
        "station_id",
        "name",
        "lat",
        "lon",
        "capacity",
        "address",
        F.array_join("rental_methods", ",").alias("rental_methods"),
        F.col("is_virtual_station").cast("int").alias("is_virtual_station"),
        "external_id",
        "short_name",
        "region_id",
        F.unix_timestamp("last_updated").alias("last_updated"),
    )


def from_reference_stations(df: DataFrame) -> DataFrame:
    return df.select(
        "station_id",
        "name",
        "lat",
        "lon",
        "capacity",
        "address",
        # '' round-trips to [] (the reference writes ",".join([]) == "");
        # only NULL maps back to NULL — keeps compose(to, from) == id
        F.when(
            F.col("rental_methods") == "", F.array().cast("array<string>")
        )
        .when(
            F.col("rental_methods").isNotNull(),
            F.split("rental_methods", ","),
        )
        .alias("rental_methods"),
        F.col("is_virtual_station").cast("boolean").alias("is_virtual_station"),
        "external_id",
        "short_name",
        "region_id",
        F.to_timestamp(F.from_unixtime("last_updated")).alias("last_updated"),
    )


def to_reference_status(status: DataFrame) -> DataFrame:
    """Native status -> reference schema: vehicles struct -> JSON
    string (F12), bools -> 0/1, timestamps -> epoch / ISO string."""
    return status.select(
        "station_id",
        "num_bikes_available",
        "num_bikes_disabled",
        "num_docks_available",
        "num_docks_disabled",
        F.col("is_installed").cast("int").alias("is_installed"),
        F.col("is_renting").cast("int").alias("is_renting"),
        F.col("is_returning").cast("int").alias("is_returning"),
        F.unix_timestamp("last_reported").alias("last_reported"),
        F.date_format("scraped_at", "yyyy-MM-dd'T'HH:mm:ssxxx").alias(
            "scraped_at"
        ),
        F.to_json("vehicles").alias("vehicles_json"),
    )


def from_reference_status(df: DataFrame) -> DataFrame:
    return df.select(
        "station_id",
        "num_bikes_available",
        "num_bikes_disabled",
        "num_docks_available",
        "num_docks_disabled",
        F.col("is_installed").cast("boolean").alias("is_installed"),
        F.col("is_renting").cast("boolean").alias("is_renting"),
        F.col("is_returning").cast("boolean").alias("is_returning"),
        F.to_timestamp(F.from_unixtime("last_reported")).alias("last_reported"),
        F.to_timestamp("scraped_at").alias("scraped_at"),
        F.from_json("vehicles_json", VEHICLE_TYPE).alias("vehicles"),
    )
