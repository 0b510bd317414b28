"""Bucketed tables must join and aggregate WITHOUT shuffling the fact.

At oracle scale the dim side is small enough that Catalyst (rightly)
prefers a broadcast join and ignores bucketing; the co-located
SortMergeJoin path is what runs when BOTH sides are too big to
broadcast, so the test pins that regime by disabling auto-broadcast.
"""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.sources import bucketing
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_ORACLE

@pytest.fixture(scope="module")
def bucketed(spark):
    ev = load(spark, SF_DIR_ORACLE, "events").select("user_id", "ts", "value")
    cu = load(spark, SF_DIR_ORACLE, "customer").select("c_custkey", "c_name") \
        .withColumnRenamed("c_custkey", "user_id")
    bucketing.write_bucketed(ev, "ev_b", "user_id", 8, sort_col="ts")
    bucketing.write_bucketed(cu, "cu_b", "user_id", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS ev_b")
    spark.sql("DROP TABLE IF EXISTS cu_b")

@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

def test_colocated_join_no_exchange(spark, bucketed, no_broadcast):
    df = bucketing.colocated_join(spark, "ev_b", "cu_b", "user_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "Exchange" not in plan, plan
    expected = (load(spark, SF_DIR_ORACLE, "events")
                .join(load(spark, SF_DIR_ORACLE, "customer")
                      .withColumnRenamed("c_custkey", "user_id"), "user_id")
                .count())
    assert df.count() == expected

def test_bucketed_aggregate_no_exchange(spark, bucketed, no_broadcast):
    df = spark.table("ev_b").groupBy("user_id").agg(F.sum("value"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

def test_fact_fact_bucketed_star_join_no_exchange(spark, no_broadcast):
    """The tpch module's scale claim, made concrete: orders and
    lineitem bucketed on orderkey join + aggregate with ZERO
    Exchange before the final roll-up — the layout a 100 TB
    deployment uses for its largest recurring join."""
    ordr = load(spark, SF_DIR_ORACLE, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load(spark, SF_DIR_ORACLE, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    bucketing.write_bucketed(ordr, "ord_b", "o_orderkey", 8)
    bucketing.write_bucketed(li, "li_b", "o_orderkey", 8)
    try:
        df = (
            bucketing.colocated_join(spark, "li_b", "ord_b", "o_orderkey")
            .groupBy("o_orderkey")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the join AND the per-orderkey aggregate reuse the bucket
        # partitioning: no Exchange anywhere in the plan
        assert "Exchange" not in plan, plan
        assert df.count() == load(
            spark, SF_DIR_ORACLE, "lineitem"
        ).select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS ord_b")
        spark.sql("DROP TABLE IF EXISTS li_b")
