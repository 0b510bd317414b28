"""Batch twins of the right/full-outer interval joins — driver-gate
differential plus semantic pins the oracle alone can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import funnels
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(funnels.QUERIES))
def test_funnels_vs_oracle(spark, duck, name):
    assert_matches_oracle(
        funnels.QUERIES[name](spark, SF_DIR_ORACLE),
        duck,
        funnels.ORACLES[name],
        name,
    )


def test_attribution_audit_covers_every_purchase(spark):
    """RIGHT-outer law: every purchase appears; unattributed ones
    exactly once with a null view side."""
    out = funnels.funnel_attribution_audit(spark, SF_DIR_ORACLE)
    n_purchases = (
        load(spark, SF_DIR_ORACLE, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    covered = out.select("purchase_id").distinct().count()
    assert covered == n_purchases
    organic = out.filter(~F.col("attributed"))
    assert (
        organic.filter(F.col("view_id") != funnels.ABSENT).count() == 0
    )
    # null rows emit once per purchase, never per (purchase, view)
    assert (
        organic.count()
        == organic.select("purchase_id").distinct().count()
    )


def test_full_ledger_is_union_of_sides(spark):
    """FULL-outer law: the ledger covers every view and every
    purchase, and its matched subset equals the inner join."""
    out = funnels.funnel_full_ledger(spark, SF_DIR_ORACLE).cache()
    events = load(spark, SF_DIR_ORACLE, "events")
    n_views = events.filter(F.col("event_type") == "view").count()
    n_purchases = events.filter(F.col("event_type") == "purchase").count()
    assert (
        out.filter(F.col("view_id") != funnels.ABSENT)
        .select("view_id")
        .distinct()
        .count()
        == n_views
    )
    assert (
        out.filter(F.col("purchase_id") != funnels.ABSENT)
        .select("purchase_id")
        .distinct()
        .count()
        == n_purchases
    )
    matched = out.filter(F.col("converted") & F.col("attributed"))
    from bike_analyzer_spark.streaming.joins import conversion_join

    inner = conversion_join(events)
    assert matched.count() == inner.count()
    out.unpersist()


def test_strict_sequence_vs_oracle(spark, duck):
    assert_matches_oracle(
        funnels.funnel_strict_sequence(spark, SF_DIR_ORACLE),
        duck,
        funnels.ORACLES["funnel_strict_sequence"],
        "funnel_strict_sequence",
    )


def test_strict_sequence_greedy_earliest_law(spark):
    """The chain must respect strict event-time order, and greedy-
    earliest must find a completion whenever ANY ordered chain
    exists. Fixture: user 1 has click BEFORE the first view (doesn't
    count) and one after; user 2's only click precedes every view
    (stage stops at 1); user 3 completes all three."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ts(minute):
        return t0 + dt.timedelta(minutes=minute)

    rows = [
        # user 1: click@1 < view@2 (ignored), click@3 counts
        (1, ts(1), 1, "click"), (2, ts(2), 1, "view"),
        (3, ts(3), 1, "click"),
        # user 2: click only BEFORE its view
        (4, ts(1), 2, "click"), (5, ts(2), 2, "view"),
        # user 3: full chain, with a decoy purchase before the click
        (6, ts(1), 3, "view"), (7, ts(2), 3, "purchase"),
        (8, ts(3), 3, "click"), (9, ts(4), 3, "purchase"),
    ]
    import os

    df = spark.createDataFrame(
        [(e, t, u, k, 0.0, "{}") for e, t, u, k in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(spark.conf.get("spark.sql.warehouse.dir")).replace(
        "file:", ""
    )
    # run the operator on an in-memory frame through its stage logic
    from pyspark.sql import functions as F

    ev = df.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("us").alias("v_us"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id").filter(F.col("us") > F.col("v_us"))
        .groupBy("user_id").agg(F.min("us").alias("c_us"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id").filter(F.col("us") > F.col("c_us"))
        .groupBy("user_id").agg(F.min("us").alias("p_us"))
    )
    out = {
        r.user_id: r
        for r in views.join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .collect()
    }
    us = lambda m: int((ts(m) - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    assert out[1].c_us == us(3)  # the pre-view click was ignored
    assert out[1].p_us is None
    assert out[2].c_us is None  # click before view never counts
    assert out[3].c_us == us(3) and out[3].p_us == us(4)  # decoy skipped
