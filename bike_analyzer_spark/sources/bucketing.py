"""Bucketed-table support — the co-located join path (SURVEY.md §1.3:
the reference's composite index (station_id, scraped_at) encodes its
dominant access path; the Spark-native analog is bucketing + in-bucket
sort so repeated key-joins and per-key windows need NO shuffle).

At 100 TB this is the difference between shuffling the fact table on
every join/window and shuffling it once at write time: two tables
bucketed by the same key into the same bucket count join with zero
Exchange, and a window partitioned by the bucket key reads
sort-merged buckets directly.

Plain parquet files cannot carry bucket metadata — bucketed tables go
through the session catalog (saveAsTable under spark-warehouse), which
is exactly how a metastore-backed production deployment works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Materialize df as a bucketed (and optionally in-bucket-sorted)
    managed table, replacing any previous version."""
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed prior run can leave the managed location behind with no
    # catalog entry; saveAsTable then fails with LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    leftover = os.path.join(warehouse, table.split(".")[-1])
    if os.path.exists(leftover):
        shutil.rmtree(leftover)
    w = df.write.format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.mode("overwrite").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With equal
    bucket counts Catalyst plans a SortMergeJoin with NO Exchange on
    either side (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on)
