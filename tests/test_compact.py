"""Compaction: fewer files, identical content, crash-recoverable."""

import os
import shutil

from pyspark.sql import functions as F

from bike_analyzer_spark.sources import catalog, sinks
from tests.conftest import SF_DIR_SMOKE


def _fragmented_table(spark, tmp_path):
    """A 16-file copy of the smoke documents — a freshly-accreted
    small-files table."""
    path = str(tmp_path / "frag")
    (
        catalog.load(spark, SF_DIR_SMOKE, "documents")
        .repartition(16)
        .write.parquet(path)
    )
    return path


def test_compaction_preserves_content_and_reduces_files(spark, tmp_path):
    path = _fragmented_table(spark, tmp_path)
    before = sorted(
        map(tuple, spark.read.parquet(path).collect())
    )
    n_before, n_after = sinks.compact_parquet(
        spark, path, target_bytes=1 << 30
    )
    assert n_before == 16 and n_after == 1
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before


def test_compaction_is_noop_when_already_compact(spark, tmp_path):
    path = _fragmented_table(spark, tmp_path)
    sinks.compact_parquet(spark, path, target_bytes=1 << 30)
    n_before, n_after = sinks.compact_parquet(
        spark, path, target_bytes=1 << 30
    )
    assert (n_before, n_after) == (1, 1)


def test_crashed_swap_is_recovered(spark, tmp_path):
    """Simulate a kill between the two renames: table at .old, nothing
    at path — the next compact (or merge) call must heal it."""
    path = _fragmented_table(spark, tmp_path)
    n = spark.read.parquet(path).count()
    os.rename(path, path + ".old")
    n_before, n_after = sinks.compact_parquet(
        spark, path, target_bytes=1 << 30
    )
    assert spark.read.parquet(path).count() == n


def test_partitioned_layout_is_preserved(spark, tmp_path):
    """Compacting a hive-partitioned table must keep the event_date=
    directory structure (and thus PartitionFilters pruning), compacting
    WITHIN partitions rather than flattening them."""
    path = str(tmp_path / "part")
    (
        catalog.load(spark, SF_DIR_SMOKE, "events")
        .withColumn("event_date", F.to_date("ts"))
        .repartition(8)
        .write.partitionBy("event_date")
        .parquet(path)
    )
    before = sorted(
        map(tuple, spark.read.parquet(path).drop("event_date").collect())
    )
    n_dates = len(
        [d for d in os.listdir(path) if d.startswith("event_date=")]
    )
    n_before, n_after = sinks.compact_parquet(
        spark, path, target_bytes=1 << 30
    )
    assert n_before > n_dates >= n_after
    dirs = [d for d in os.listdir(path) if d.startswith("event_date=")]
    assert len(dirs) == n_dates
    after = sorted(
        map(tuple, spark.read.parquet(path).drop("event_date").collect())
    )
    assert after == before
    plan = (
        spark.read.parquet(path)
        .filter(F.col("event_date") == dirs[0].split("=", 1)[1])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "event_date" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
