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
