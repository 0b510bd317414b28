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
