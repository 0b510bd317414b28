"""Moment statistics: oracle parity, agreement with Spark's builtin
estimators, and the bit-stability claim the module exists for."""

import math

from pyspark.sql import functions as F

from bike_analyzer_spark.operators import stats
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_stats_vs_oracle(spark, duck):
    df = stats.stats_moments(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, stats.ORACLES["stats_moments"], name="stats_moments"
    )


def test_matches_builtin_estimators(spark):
    """The exact-moment forms agree with Spark's double-accumulating
    builtins to float tolerance (they compute the same statistic;
    only the accumulation differs)."""
    got = {
        r["event_type"]: r
        for r in stats.stats_moments(spark, SF_DIR_ORACLE).collect()
    }
    ref = (
        load(spark, SF_DIR_ORACLE, "events")
        .select(
            "event_type",
            (F.round(F.col("value") * 100, 0) / 100).alias("v"),
            F.hour("ts").cast("double").alias("h"),
        )
        .groupBy("event_type")
        .agg(
            F.stddev_samp("v").alias("sd"),
            F.corr("v", "h").alias("c"),
            F.regr_slope("v", "h").alias("m"),
            F.regr_intercept("v", "h").alias("b"),
        )
        .collect()
    )
    assert got
    for r in ref:
        g = got[r["event_type"]]
        assert math.isclose(g["stddev_samp_v"], r["sd"], rel_tol=1e-9)
        assert math.isclose(g["corr_vh"], r["c"], rel_tol=1e-6)
        assert math.isclose(g["slope_vh"], r["m"], rel_tol=1e-6)
        assert math.isclose(g["intercept_vh"], r["b"], rel_tol=1e-6)


def test_partition_invariance(spark):
    """Integer power sums make the result bit-identical across
    physical layouts — the property the builtins lack."""
    base = stats.stats_moments(spark, SF_DIR_ORACLE).collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        other = stats.stats_moments(spark, SF_DIR_ORACLE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert sorted(map(tuple, base)) == sorted(map(tuple, other))
