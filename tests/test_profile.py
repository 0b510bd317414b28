import pytest
from bike_analyzer_spark.operators import profile as prof
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

def test_profile_events_vs_oracle(spark, duck):
    df = prof.QUERIES["profile_events"](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, prof.ORACLES["profile_events"],
                          name="profile_events")

def test_profile_single_pass(spark):
    """One scan of the profiled table, regardless of column count."""
    from bike_analyzer_spark.sources.catalog import load
    df = prof.profile(load(spark, SF_DIR_ORACLE, "events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan

def test_profile_null_handling(spark):
    rows = [(1, None), (2, "x"), (None, "y")]
    df = spark.createDataFrame(rows, "a int, b string")
    got = {r.col_name: (r.n_nonnull, r.null_rate, r.min_value, r.max_value)
           for r in prof.profile(df).collect()}
    assert got["a"] == (2, 0.3333, 1.0, 2.0)
    assert got["b"][0] == 2 and got["b"][2] is None


def test_integrity_audit_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators.profile import (
        ORACLES,
        integrity_audit,
    )

    assert_matches_oracle(
        integrity_audit(spark, SF_DIR_ORACLE),
        duck,
        ORACLES["integrity_audit"],
        name="integrity_audit",
    )


def test_integrity_audit_detects_planted_orphans(spark, tmp_path):
    """Deleting parents and nulling keys in a copied mini-warehouse
    surfaces exactly the planted violations."""
    from pyspark.sql import functions as F

    from bike_analyzer_spark.operators.profile import integrity_audit
    from bike_analyzer_spark.sources.catalog import load
    from tests.conftest import SF_DIR_SMOKE

    sf = str(tmp_path)
    for t in ["lineitem", "customer", "nation", "events"]:
        load(spark, SF_DIR_SMOKE, t).write.parquet(f"{sf}/{t}.parquet")
    orders = load(spark, SF_DIR_SMOKE, "orders")
    victims = [
        r.l_orderkey
        for r in load(spark, SF_DIR_SMOKE, "lineitem")
        .select("l_orderkey")
        .distinct()
        .orderBy("l_orderkey")
        .limit(3)
        .collect()
    ]
    # drop 3 referenced orders; null 5 order custkeys
    (
        orders.where(~F.col("o_orderkey").isin(victims))
        .withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 997 < 5, None).otherwise(
                F.col("o_custkey")
            ),
        )
        .write.parquet(f"{sf}/orders.parquet")
    )
    got = {r.relationship: r for r in integrity_audit(spark, sf).collect()}
    li = got["lineitem.orderkey->orders"]
    assert li.n_orphan_keys == 3
    assert li.n_orphan_rows >= 3
    oc = got["orders.custkey->customer"]
    assert oc.n_null_keys > 0
    assert oc.n_orphan_keys == 0
    # untouched relationships stay clean
    assert got["customer.nationkey->nation"].n_orphan_keys == 0


def test_skew_report_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators.profile import (
        ORACLES,
        skew_report,
    )

    assert_matches_oracle(
        skew_report(spark, SF_DIR_ORACLE),
        duck,
        ORACLES["skew_report"],
        name="skew_report",
    )


def test_skew_report_matches_pure_python(spark):
    """statistics.median + brute-force order stats over the raw
    rows-per-key lists reproduce every column."""
    import statistics
    from collections import Counter

    from bike_analyzer_spark.operators.profile import (
        SKEW_KEYS,
        skew_report,
    )
    from tests.conftest import SF_DIR_SMOKE

    got = {
        r.shuffle_key: r
        for r in skew_report(spark, SF_DIR_SMOKE).collect()
    }
    for name, table, key in SKEW_KEYS:
        counts = Counter(
            r[0]
            for r in spark.read.parquet(
                f"{SF_DIR_SMOKE}/{table}.parquet"
            )
            .select(key)
            .collect()
            if r[0] is not None
        )
        per_key = sorted(counts.values())
        r = got[name]
        assert r.n_rows == sum(per_key)
        assert r.n_keys == len(per_key)
        assert r.max_key_rows == per_key[-1]
        assert r.p50_rows == float(statistics.median(per_key))
        k = len(per_key)
        assert r.p99_rows == per_key[-(-99 * k // 100) - 1]


def test_event_disorder_vs_oracle(spark, duck):
    df = prof.event_disorder_profile(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df,
        duck,
        prof.ORACLES["event_disorder_profile"],
        name="event_disorder_profile",
    )


def test_event_disorder_invariants(spark):
    rows = prof.event_disorder_profile(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        # late-beyond-watermark events are a subset of out-of-order
        # events, which are a subset of all events
        assert 0 <= r.n_late_30m <= r.n_out_of_order <= r.n_events
        assert r.max_lag_us >= 0
        if r.n_out_of_order == 0:
            assert r.max_lag_us == 0
