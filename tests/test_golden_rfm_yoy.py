"""Golden-record survivorship, RFM segments, and monthly YoY beyond
their oracle gates: cluster-consistency, partition/threshold
identities, and a python YoY recount."""

import duckdb
import pytest

from bike_analyzer_spark.operators import analytics_ext, fuzzy, useranalytics
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_entity_golden_record_vs_oracle(spark, duck):
    assert_matches_oracle(
        fuzzy.entity_golden_record(spark, SF_DIR_ORACLE),
        duck,
        fuzzy.ORACLES["entity_golden_record"],
        name="entity_golden_record",
    )


def test_golden_record_consistent_with_clusters(spark):
    """Same entities as entity_clusters; the survivor is a member
    and holds the member-max text length (min doc_id on ties)."""
    clusters = {
        r.canonical_id: r.members.split(",")
        for r in fuzzy.entity_clusters(spark, SF_DIR_ORACLE).collect()
    }
    lens = dict(
        duckdb.sql(
            f"SELECT doc_id, length(text) FROM"
            f" '{SF_DIR_ORACLE}/documents.parquet'"
        ).fetchall()
    )
    rows = fuzzy.entity_golden_record(spark, SF_DIR_ORACLE).collect()
    assert {r.canonical_id for r in rows} == set(clusters)
    for r in rows:
        members = [int(m) for m in clusters[r.canonical_id]]
        assert r.n_members == len(members)
        assert r.survivor_id in members
        best = max(members, key=lambda m: (lens[m], -m))
        assert r.survivor_id == best
        assert r.survivor_len == lens[best] == max(
            lens[m] for m in members
        )
        assert r.total_len == sum(lens[m] for m in members)


def test_rfm_segments_vs_oracle(spark, duck):
    assert_matches_oracle(
        useranalytics.rfm_segments(spark, SF_DIR_ORACLE),
        duck,
        useranalytics.ORACLES["rfm_segments"],
        name="rfm_segments",
    )


def test_rfm_partitions_users(spark):
    rows = useranalytics.rfm_segments(spark, SF_DIR_ORACLE).collect()
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM"
        f" '{SF_DIR_ORACLE}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.n_users for r in rows) == n_users
    assert sum(r.user_share_pct for r in rows) == pytest.approx(
        100.0, abs=0.02 * len(rows)
    )
    labels = {r.segment for r in rows}
    assert labels <= {
        f"R{a}F{b}M{c}" for a in "+-" for b in "+-" for c in "+-"
    }
    # mean splits must separate behavior, not collapse to one cell
    assert len(labels) >= 4
    # M+ segments outspend M- segments on average
    plus = [r.avg_spend for r in rows if "M+" in r.segment]
    minus = [r.avg_spend for r in rows if "M-" in r.segment]
    assert min(plus) > max(minus)


def test_monthly_yoy_vs_oracle(spark, duck):
    assert_matches_oracle(
        analytics_ext.monthly_revenue_yoy(spark, SF_DIR_ORACLE),
        duck,
        analytics_ext.ORACLES["monthly_revenue_yoy"],
        name="monthly_revenue_yoy",
    )


def test_monthly_yoy_python_recount(spark):
    rows = analytics_ext.monthly_revenue_yoy(
        spark, SF_DIR_ORACLE
    ).collect()
    monthly = dict(
        duckdb.sql(
            f"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE),
                   sum(CAST(round(o_totalprice * 100) AS BIGINT))
            FROM '{SF_DIR_ORACLE}/orders.parquet' GROUP BY 1"""
        ).fetchall()
    )
    assert {r.month for r in rows} == set(monthly)
    import datetime

    for r in rows:
        assert round(r.revenue * 100) == monthly[r.month]
        prior_month = datetime.date(
            r.month.year - 1, r.month.month, 1
        )
        if prior_month in monthly:
            want = (
                100
                * (monthly[r.month] - monthly[prior_month])
                / monthly[prior_month]
            )
            assert r.yoy_pct == pytest.approx(want, abs=5e-3)
        else:
            assert r.yoy_pct is None
    # the first 12 observed months have no prior-year twin
    first = min(monthly)
    assert all(
        r.yoy_pct is None
        for r in rows
        if (r.month.year - first.year) * 12
        + (r.month.month - first.month)
        < 12
    )


def test_basket_size_profile_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators import warehouse_ext as wx

    assert_matches_oracle(
        wx.basket_size_profile(spark, SF_DIR_ORACLE),
        duck,
        wx.ORACLES["basket_size_profile"],
        name="basket_size_profile",
    )


def test_basket_profile_identities(spark):
    from bike_analyzer_spark.operators import warehouse_ext as wx

    rows = sorted(
        wx.basket_size_profile(spark, SF_DIR_ORACLE).collect(),
        key=lambda r: r.basket_size,
    )
    n_orders = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM"
        f" '{SF_DIR_ORACLE}/lineitem.parquet'"
    ).fetchone()[0]
    assert sum(r.n_orders for r in rows) == n_orders
    cums = [r.cum_share_pct for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == 100.0
    assert sum(r.share_pct for r in rows) == pytest.approx(
        100.0, abs=0.01 * len(rows)
    )
