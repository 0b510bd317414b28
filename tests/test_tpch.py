"""TPC-H-shaped star joins: oracle parity, exact-money agreement
with naive double math, and the plan shapes the module's docstring
promises (pushdown, partial aggregation, broadcast dims)."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import tpch
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_vs_oracle(spark, duck, name):
    df = tpch.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, tpch.ORACLES[name], name=name)


def test_pricing_summary_shape(spark):
    """All 6 (returnflag, linestatus) groups survive the cutoff, and
    the integer-cents revenue agrees with naive double-precision
    revenue to within rounding noise."""
    rows = tpch.tpch_pricing_summary(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 6
    naive = (
        load(spark, SF_DIR_ORACLE, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit(tpch.Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev")
        )
        .collect()
    )
    by_key = {(r.l_returnflag, r.l_linestatus): r.rev for r in naive}
    for r in rows:
        assert r.sum_disc_price == pytest.approx(
            by_key[(r.l_returnflag, r.l_linestatus)], abs=0.02
        )
        assert 0 <= r.avg_disc <= 0.11
        assert r.sum_base_price >= r.sum_disc_price
        assert r.sum_charge >= r.sum_disc_price


def test_shipping_priority_deterministic_top10(spark):
    rows = tpch.tpch_shipping_priority(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # an order is only open if placed before the split date
    assert all(
        r.o_orderdate.isoformat() < tpch.Q3_DATE for r in rows
    )


def test_regional_revenue_is_regional(spark, duck):
    rows = tpch.tpch_regional_revenue(spark, SF_DIR_ORACLE).collect()
    asia = {
        r[0]
        for r in duck.sql(
            "SELECT n_name FROM nation JOIN region "
            "ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'"
        ).fetchall()
    }
    assert {r.n_name for r in rows} <= asia
    assert len(rows) > 0
    assert all(r.revenue > 0 for r in rows)


def test_plan_shapes(spark):
    """Date/flag/segment predicates reach the scans; nation/region
    stay broadcast; aggregation is partial before the exchange."""
    q1 = tpch.tpch_pricing_summary(spark, SF_DIR_ORACLE)
    p1 = q1._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p1
    assert "partial_sum" in p1.lower() or "HashAggregate" in p1

    q5 = tpch.tpch_regional_revenue(spark, SF_DIR_ORACLE)
    p5 = q5._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p5
    assert "CartesianProduct" not in p5

    q10 = tpch.tpch_returned_items(spark, SF_DIR_ORACLE)
    p10 = q10._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(l_returnflag,R)" in p10
    assert "TakeOrderedAndProject" in p10


def test_money_lift_is_exact_for_all_2dp_values(spark):
    """Property: for ANY 2-decimal price/discount/tax (hypothesis
    sweeps the full TPC-H domains), the integer-cents lift reproduces
    the Decimal-exact revenue and charge — i.e. round(x*100) undoes
    the float representation error of every 2-dp literal, and the
    bigint products stay exact."""
    from decimal import Decimal

    from hypothesis import given, settings, strategies as st

    @settings(deadline=None, max_examples=200)
    @given(
        price_c=st.integers(min_value=90000, max_value=10500000),
        disc_p=st.integers(min_value=0, max_value=10),
        tax_p=st.integers(min_value=0, max_value=8),
    )
    def check(price_c, disc_p, tax_p):
        price = float(Decimal(price_c) / 100)  # the parquet double
        lifted_rev = round(price * 100) * (100 - round(0.01 * disc_p * 100))
        exact_rev = price_c * (100 - disc_p)
        assert lifted_rev == exact_rev
        lifted_charge = lifted_rev * (100 + round(0.01 * tax_p * 100))
        assert lifted_charge == exact_rev * (100 + tax_p)

    check()


def test_money_lift_column_matches_python(spark):
    """The Spark column expression and the Python reference agree on
    a grid of boundary-ish prices (the .x5 cents where naive float
    multiplication misrounds)."""
    rows = [(i, (10000 * i + 5) / 100.0, 0.05) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "id long, l_extendedprice double, l_discount double")
    got = {
        r.id: r.rev
        for r in df.select(
            "id",
            (
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * (100 - F.round(F.col("l_discount") * 100, 0).cast("int"))
            ).alias("rev"),
        ).collect()
    }
    for i, price, _ in rows:
        assert got[i] == round(price * 100) * 95, (i, price)


def test_wave3_plan_shapes(spark):
    """The round-8 shapes produce the plans they exist to
    demonstrate: Q4's EXISTS is a LEFT SEMI join (no fan-out) with
    the order window pushed to the scan; Q16's size IN-list reaches
    the part scan and the flagged-supplier NOT IN is a broadcast
    ANTI join; Q11's rollup aggregates partially before its single
    supplier-keyed exchange."""
    p4 = (
        tpch.tpch_late_shipment_priority(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in p4
    assert "GreaterThanOrEqual(o_orderdate" in p4
    p16 = (
        tpch.tpch_parts_supplier_variety(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "In(p_size" in p16
    assert "LeftAnti" in p16 and "BroadcastHashJoin" in p16
    p11 = (
        tpch.tpch_top_supplier_share(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ONE lineitem scan: the 1-row total reuses the checkpointed
    # supplier rollup instead of re-running the corpus subtree
    assert p11.count("FileScan") <= 1
