"""NTILE / navigation-trio / GROUPING SETS shapes: oracle parity plus
the structural properties each function is defined by."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import winfuncs
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(winfuncs.QUERIES))
def test_winfuncs_vs_oracle(spark, duck, name):
    df = winfuncs.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, winfuncs.ORACLES[name], name=name)


def test_quartiles_partition_the_purchases(spark):
    """The N_TILES buckets partition the purchase set (every row in
    exactly one bucket) and NTILE's balance rule holds corpus-wide:
    bucket sizes differ by at most the number of users (each user
    contributes per-bucket sizes differing by ≤1)."""
    rows = winfuncs.purchase_quartiles(spark, SF_DIR_ORACLE).collect()
    assert sorted(r["quartile"] for r in rows) == list(
        range(1, winfuncs.N_TILES + 1)
    )
    n_total = sum(r["n_purchases"] for r in rows)
    n_purch = (
        winfuncs._purchases(spark, SF_DIR_ORACLE).count()
    )
    assert n_total == n_purch


def test_navigation_trio_consistency(spark):
    """Per user: a single purchase means second_value collapses to
    the COALESCE(0) branch and first == last; two or more mean the
    navigation values are genuine purchases (all on the milli-unit
    grid, first ≤ last only when values happen ordered — NOT
    asserted, time order isn't value order)."""
    rows = winfuncs.user_value_navigation(
        spark, SF_DIR_ORACLE
    ).collect()
    assert rows, "no purchase users at oracle SF"
    singles = [r for r in rows if r["n_purchases"] == 1]
    for r in singles:
        assert r["second_value"] == 0.0
        assert r["first_value"] == r["last_value"]
    assert any(r["n_purchases"] >= 2 for r in rows)


def test_grouping_sets_is_one_expand_one_scan(spark):
    """The hand-picked set list expands BEFORE the partial aggregate
    — single Expand node, single scan, like the CUBE plan class."""
    plan = (
        winfuncs.event_grouping_sets(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") == 1
    assert plan.count("FileScan") == 1


def test_grouping_sets_excludes_the_cell_set(spark):
    """gid=0 (both keys live — the (event_type, hour) cell) must NOT
    appear: its absence is what distinguishes the hand-picked list
    from the CUBE that cube_type_hour already covers."""
    gids = {
        r["gid"]
        for r in winfuncs.event_grouping_sets(
            spark, SF_DIR_ORACLE
        ).collect()
    }
    assert gids == {1, 2, 3}


def test_distribution_head_pins(spark):
    """percent_rank of the within-user max is exactly 1.0 (micro =
    1e6) whenever the user has >1 purchase — and 0 for singletons
    ((rank-1)/(n-1) with rank=n=1); cume_dist of the max is exactly
    1.0 always. Python re-derivation of n from the raw rows."""
    from collections import Counter

    from bike_analyzer_spark.operators.winfuncs import (
        purchase_value_distribution,
    )
    from bike_analyzer_spark.sources.catalog import load
    from tests.conftest import SF_DIR_ORACLE

    rows = purchase_value_distribution(spark, SF_DIR_ORACLE).collect()
    assert rows
    n_by_user = Counter(
        r.user_id
        for r in load(spark, SF_DIR_ORACLE, "events")
        .filter("event_type = 'purchase'")
        .select("user_id")
        .collect()
    )
    assert {r.user_id: r.n_purchases for r in rows} == dict(n_by_user)
    for r in rows:
        assert r.top_cume_dist_micro == 1_000_000
        expect_pr = 1_000_000 if r.n_purchases > 1 else 0
        assert r.top_percent_rank_micro == expect_pr, r
