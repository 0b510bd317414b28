"""Skew handling, pinned both ways: AQE's runtime skew-join split
(the default path the engine leans on at 100 TB) and the manual
salted join (the deterministic fallback)."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import scale


@pytest.fixture()
def skewed(spark):
    """99% of fact rows share one key; dim has 50 keys."""
    facts = spark.range(0, 100_000).select(
        F.when(F.col("id") % 100 == 0, (F.col("id") / 100) % 50)
        .otherwise(F.lit(7))
        .cast("int")
        .alias("k"),
        F.col("id").alias("rid"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("dim_"), F.col("id")).alias("label"),
    )
    return facts, dim


def test_aqe_splits_skewed_sortmerge_join(spark, skewed):
    """With broadcast disabled (forcing the sort-merge regime) and
    test-sized skew thresholds, AQE must mark and split the hot
    partition — the runtime behavior session.py enables for real
    skew at scale."""
    facts, dim = skewed
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        df = facts.join(dim, "k")
        # collect() (not count()) so THIS DataFrame's queryExecution
        # runs to isFinalPlan=true — count() executes a different
        # wrapped plan and leaves df's own plan un-finalized
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_salted_join_equivalent_and_spread(spark, skewed):
    facts, dim = skewed
    expected = sorted(
        (r.k, r.rid, r.label) for r in facts.join(dim, "k").collect()
    )
    got_df = scale.salted_join(facts, dim, "k", n_salts=8,
                               salt_source="rid")
    got = sorted((r.k, r.rid, r.label) for r in got_df.collect())
    assert got == expected and len(got) == 100_000
    # the hot key really scatters: all 8 salt values carry rows
    spread = (
        facts.withColumn(
            "_salt", F.pmod(F.hash(F.col("rid")), F.lit(8))
        )
        .filter(F.col("k") == 7)
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(spread) == 8
    assert max(r["count"] for r in spread) < 99_000 * 0.25


def test_salted_join_rollup_matches_plain_join(spark):
    """The registered salted-join query is value-identical to the
    plain equi join + GROUP BY rewrite (row-for-row)."""
    from pyspark.sql import functions as F

    from bike_analyzer_spark.operators import scale
    from bike_analyzer_spark.sources.catalog import load
    from tests.conftest import SF_DIR_ORACLE as _SF

    got = scale.salted_event_nation_rollup(spark, _SF).collect()
    ev = load(spark, _SF, "events").select(
        F.col("user_id").alias("c_custkey"),
        F.round(F.col("value") * 1000, 0).cast("long").alias("v_m"),
    )
    cust = load(spark, _SF, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, _SF, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    plain = (
        ev.join(cust, "c_custkey")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("c_custkey").alias("n_users"),
            F.sum("v_m").alias("sum_value_milli"),
        )
        .join(nat, "c_nationkey")
        .select("n_name", "n_events", "n_users", "sum_value_milli")
        .orderBy("n_name")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in plain]
    assert got, "rollup must be non-empty"
