"""File-level data skipping over the Z-order layout: the stats
sidecar prunes the file list on BOTH dimensions of a z-ordered
table, on only one of a time-sorted one, and pruned reads return
exactly the full-scan answer."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import layout
from bike_analyzer_spark.sources import skipping
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_ORACLE


#: 64 files = 6 z-bits = 3 bits per dimension — enough granularity
#: for a ~10%-wide band to prune hard (16 files would leave only 2
#: bits/dim: a band always straddles most of the 4 coarse quadrants)
N = 64


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("skip")
    zpath, tpath = str(base / "events_z"), str(base / "events_t")
    layout.write_zorder(spark, SF_DIR_ORACLE, zpath, n_files=N)
    (
        load(spark, SF_DIR_ORACLE, "events")
        .repartitionByRange(N, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(tpath)
    )
    for p in (zpath, tpath):
        skipping.build_stats(spark, p, ["user_id", "ts"])
    return zpath, tpath


def _mid_user_range(spark):
    b = (
        load(spark, SF_DIR_ORACLE, "events")
        .agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi"))
        .collect()[0]
    )
    span = b.hi - b.lo
    return b.lo + span * 45 // 100, b.lo + span * 55 // 100


def test_zorder_prunes_user_ranges_time_layout_cannot(spark, layouts):
    zpath, tpath = layouts
    lo, hi = _mid_user_range(spark)
    z_files = skipping.candidate_files(spark, zpath, "user_id", lo, hi)
    t_files = skipping.candidate_files(spark, tpath, "user_id", lo, hi)
    assert len(z_files) <= N // 2       # real 2-D skipping
    assert len(t_files) == N            # no skipping possible


def test_pruned_read_equals_full_scan(spark, layouts):
    zpath, _ = layouts
    lo, hi = _mid_user_range(spark)
    pruned = {
        r.event_id
        for r in skipping.pruned_read(
            spark, zpath, "user_id", lo, hi
        ).select("event_id").collect()
    }
    full = {
        r.event_id
        for r in load(spark, SF_DIR_ORACLE, "events")
        .filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
        .select("event_id")
        .collect()
    }
    assert pruned == full and len(full) > 0


def test_out_of_range_predicate_opens_zero_files(spark, layouts):
    zpath, _ = layouts
    df = skipping.pruned_read(spark, zpath, "user_id", -10, -1)
    assert df.count() == 0
    assert skipping.candidate_files(spark, zpath, "user_id", -10, -1) == []


def test_time_pruning_works_on_both_layouts(spark, layouts):
    zpath, tpath = layouts
    b = (
        load(spark, SF_DIR_ORACLE, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    mid = b.lo + (b.hi - b.lo) / 2
    z_files = skipping.candidate_files(spark, zpath, "ts", b.lo, mid)
    t_files = skipping.candidate_files(spark, tpath, "ts", b.lo, mid)
    assert len(t_files) <= N // 2 + 1   # sorted: tight
    assert len(z_files) < N             # z: still skips some


def test_null_stats_file_stays_candidate(spark, tmp_path):
    """A file whose column is all-NULL carries NULL min/max stats: it
    cannot be proven prunable, so the pruned read must include it and
    let the exact predicate drop its rows — not raise (round-7
    ADVICE)."""
    import os

    from bike_analyzer_spark.sources import skipping

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, v double"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    spark.createDataFrame(
        [(3, None), (4, None)], "id long, v double"
    ).coalesce(1).write.mode("append").parquet(p)
    skipping.build_stats(spark, p, ["v"])
    got = skipping.pruned_read(spark, p, "v", 5.0, 15.0)
    assert [r.id for r in got.collect()] == [1]
    # and the all-NULL file is still listed as a candidate
    assert len(skipping.candidate_files(spark, p, "v", 5.0, 15.0)) == 2
