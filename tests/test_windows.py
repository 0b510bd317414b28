"""Window/delta layer vs DuckDB oracle + plan-shape assertions."""

import pytest

from bike_analyzer_spark.operators import windows
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(windows.QUERIES))
def test_windows_vs_oracle(spark, duck, name):
    df = windows.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, windows.ORACLES[name], name=name)


def test_delta_pipeline_single_shuffle(spark):
    """W1 window + A8 groupBy must reuse one hash partitioning on
    user_id: exactly one Exchange below the activity aggregate."""
    from bike_analyzer_spark.sources.catalog import load

    events = load(spark, SF_DIR_ORACLE, "events")
    plan = windows._activity_by_user(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_lag_delta_first_row_zero(spark):
    """fillna(0) semantics: every user's earliest event has delta 0."""
    from pyspark.sql import functions as F

    df = windows.w1_lag_delta(spark, SF_DIR_ORACLE)
    firsts = (
        df.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql", fromlist=["Window"]).Window
                .partitionBy("user_id")
                .orderBy("ts_us", "event_id")
            ),
        )
        .filter("rn = 1")
        .filter("delta != 0.0")
        .count()
    )
    assert firsts == 0
