"""Gaps-and-islands + bucketized range join: oracle parity (the
oracle uses the NAIVE inequality join — an independent plan), island
maximality properties, and the no-nested-loop plan contract."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import rangejoin
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(rangejoin.QUERIES))
def test_rangejoin_vs_oracle(spark, duck, name):
    df = rangejoin.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, rangejoin.ORACLES[name], name=name)


def test_islands_are_maximal_and_busy(spark):
    """Every island hour is busy; islands are separated by at least
    one non-busy hour (maximality — adjacent islands would have
    merged)."""
    busy = {
        r.hr for r in rangejoin._hourly_busy(spark, SF_DIR_ORACLE).collect()
    }
    islands = rangejoin.busy_islands(spark, SF_DIR_ORACLE).collect()
    assert islands
    import datetime as dt

    hour = dt.timedelta(hours=1)
    epoch = dt.datetime(1970, 1, 1)
    spans = []
    for isl in islands:
        start = epoch + dt.timedelta(microseconds=isl.start_us)
        end = epoch + dt.timedelta(microseconds=isl.end_us)
        spans.append((start, end))
        n = 0
        h = start
        while h < end:
            assert h in busy, "island contains a non-busy hour"
            h += hour
            n += 1
        assert n == isl.n_hours
    spans.sort()
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 < s2, "islands overlap or touch (not maximal)"
        assert e1 + hour <= s2  # at least one quiet hour between


def test_range_join_plan_has_no_nested_loop(spark):
    """The scale contract: the containment join must be an equi join
    on the hour bucket — no BroadcastNestedLoopJoin, no
    CartesianProduct anywhere in the plan."""
    plan = (
        rangejoin.range_join_busy(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_purchases_outside_islands_are_dropped(spark):
    """Left-out purchases must genuinely fall outside every island."""
    joined = {
        r.event_id
        for r in rangejoin.range_join_busy(spark, SF_DIR_ORACLE).collect()
    }
    islands = rangejoin.busy_islands(spark, SF_DIR_ORACLE).collect()
    from bike_analyzer_spark.sources.catalog import load

    purchases = (
        load(spark, SF_DIR_ORACLE, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", F.unix_micros("ts").alias("ts_us"))
        .collect()
    )
    for p in purchases:
        inside = any(
            isl.start_us <= p.ts_us < isl.end_us for isl in islands
        )
        assert inside == (p.event_id in joined)
