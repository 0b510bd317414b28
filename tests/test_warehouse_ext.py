"""Warehouse-extension shapes (staged for round-8 driver
registration): full DuckDB oracle parity — the same gate the driver
runs — plus the plan contracts each shape exists to demonstrate."""

import pytest

from bike_analyzer_spark.operators import warehouse_ext
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(warehouse_ext.QUERIES))
def test_warehouse_ext_vs_oracle(spark, duck, name):
    df = warehouse_ext.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, warehouse_ext.ORACLES[name], name=name
    )


def test_dormant_customers_plans_anti_join(spark):
    plan = (
        warehouse_ext.dormant_customers(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    # the window predicate reaches the orders scan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or (
        "GreaterThanOrEqual(o_orderdate" in plan
    )


def test_above_avg_orders_single_window_pass(spark):
    """One shuffle: the per-customer sum/count windows and the final
    aggregate all reuse the o_custkey partitioning."""
    plan = (
        warehouse_ext.above_avg_orders(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning(o_custkey") == 1


def test_cube_is_one_pass(spark):
    """The cube expands grouping sets BEFORE the partial aggregate —
    a single Expand + one exchange, not one scan per grouping set."""
    plan = (
        warehouse_ext.cube_type_hour(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") >= 1
    assert plan.count("FileScan") == 1


def test_purchase_rank_integer_identities_match_window_fns(spark):
    """The displayed pct_rank/cume_dist come from integer (rn, n)
    through the exact half-up (round-7 ADVICE removed the
    round()-on-double display). With the UNIQUE (v_m, event_id)
    order percent_rank ≡ (rn-1)/(n-1) and cume_dist ≡ rn/n — pin the
    identities against Spark's real window functions so the §2.6
    ranking-function claim stays tested, not asserted."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bike_analyzer_spark.sources.catalog import load

    ev = (
        load(spark, SF_DIR_ORACLE, "events")
        .filter(F.col("event_type") == "purchase")
        .withColumn("v_m", F.round(F.col("value") * 1000, 0).cast("long"))
    )
    w = Window.partitionBy("user_id").orderBy("v_m", "event_id")
    chk = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .withColumn("pr", F.percent_rank().over(w))
        .withColumn("cd", F.cume_dist().over(w))
        .withColumn(
            "pr_int",
            F.when(F.col("n") == 1, F.lit(0.0)).otherwise(
                (F.col("rn") - 1) / (F.col("n") - 1)
            ),
        )
        .withColumn("cd_int", F.col("rn") / F.col("n"))
        .filter(
            (F.abs(F.col("pr") - F.col("pr_int")) > 1e-12)
            | (F.abs(F.col("cd") - F.col("cd_int")) > 1e-12)
        )
    )
    assert chk.count() == 0


def test_rolling_window_is_one_exchange_and_range_frame(spark):
    """The trailing-hour feature costs ONE user-keyed exchange, and
    the frame is a RANGE (event-time) frame, not ROWS."""
    plan = (
        warehouse_ext.rolling_user_spend(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "RangeFrame" in plan


def test_funnel_reconciliation_is_full_outer_on_preaggregates(spark):
    """The full outer joins (user, day) COHORTS, not raw events: both
    join inputs are aggregates, and the join type survives planning."""
    plan = (
        warehouse_ext.funnel_reconciliation(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FullOuter" in plan


def test_unpivot_is_expand_after_rollup(spark):
    """The melt plans as one Expand ABOVE the per-nation aggregate —
    Expand's input is nation-sized, never the corpus (the wrong plan
    would unpivot first and aggregate three times)."""
    plan = (
        warehouse_ext.nation_metrics_unpivot(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") == 1
    # both aggregates sit BELOW the Expand in the tree dump (Expand
    # printed first = closest to the root)
    assert plan.index("Expand") < plan.index("HashAggregate")


def test_revenue_pareto_vs_oracle(spark, duck):
    df = warehouse_ext.revenue_pareto(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df,
        duck,
        warehouse_ext.ORACLES["revenue_pareto"],
        name="revenue_pareto",
    )


def test_revenue_pareto_invariants(spark):
    rows = warehouse_ext.revenue_pareto(spark, SF_DIR_ORACLE).collect()
    assert rows, "every nation with revenue gets a row"
    for r in rows:
        # the minimal covering set is non-empty, within the base, and
        # actually covers the threshold share
        assert 1 <= r.n_top80 <= r.n_customers
        assert r.covered_rev_pct >= warehouse_ext.PARETO_PCT
        assert 0.0 < r.top80_cust_pct <= 100.0
