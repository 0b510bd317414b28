"""Deterministic split/sampling: oracle parity, stability under
reordering, salted-top-N equivalence, and the zero-shuffle split
plan."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import sampling
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(sampling.QUERIES))
def test_sampling_vs_oracle(spark, duck, name):
    df = sampling.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, sampling.ORACLES[name], name=name)


def test_split_stable_under_subsetting(spark):
    """Hash assignment is per-row: dropping half the corpus must not
    flip any surviving row's split (the property rand(seed) lacks)."""
    full = {
        r.doc_id: r.split
        for r in sampling.split_assign(spark, SF_DIR_SMOKE).collect()
    }
    import bike_analyzer_spark.operators.sampling as s

    docs = load(spark, SF_DIR_SMOKE, "documents").filter(
        F.col("doc_id") % 2 == 0
    )
    bucket = (
        s.hash64(F.col("doc_id").cast("string"), s._SPLIT_SALT) % 100
    )
    half = {
        r.doc_id: r.split
        for r in docs.select(
            "doc_id",
            F.when(bucket < s.TRAIN_PCT, F.lit("train"))
            .otherwise(F.lit("test"))
            .alias("split"),
        ).collect()
    }
    assert half == {k: v for k, v in full.items() if k % 2 == 0}


def test_split_ratio_near_target(spark):
    rows = {
        r.split: r.n_docs
        for r in sampling.split_summary(spark, SF_DIR_ORACLE).collect()
    }
    total = sum(rows.values())
    assert 0.7 < rows["train"] / total < 0.9


def test_salted_topn_equals_single_window(spark):
    """The two-stage salted top-N returns exactly the single-window
    per-stratum minima (the salting is a physical optimization, not a
    semantic change)."""
    got = {
        (r.event_type, r.event_id, r.rn)
        for r in sampling.stratified_sample(spark, SF_DIR_SMOKE).collect()
    }
    from pyspark.sql import Window
    import bike_analyzer_spark.operators.sampling as s

    ev = load(spark, SF_DIR_SMOKE, "events").select("event_id", "event_type")
    hk = s.hash64(F.col("event_id").cast("string"), s._SAMPLE_SALT)
    w = Window.partitionBy("event_type").orderBy(hk.alias("hk"), "event_id")
    want = {
        (r.event_type, r.event_id, r.rn)
        for r in ev.withColumn(
            "rn", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("rn") <= s.STRATA_N)
        .collect()
    }
    assert got == want and len(got) > 0


def test_weighted_salted_topn_equals_single_window(spark):
    """The salted two-stage weighted top-N equals the unsalted
    single-window A-ES draw — salting is physical only."""
    got = [
        (r.rank, r.doc_id)
        for r in sampling.weighted_sample(spark, SF_DIR_SMOKE).collect()
    ]
    from pyspark.sql import Window
    import bike_analyzer_spark.operators.sampling as s

    docs = load(spark, SF_DIR_SMOKE, "documents").filter(
        F.col("n_chars") > 0
    )
    u = (
        s.hash64(F.col("doc_id").cast("string"), s._WS_SALT) + 1
    ) / F.lit(float(s._U_DEN))
    pri = (
        F.round(F.log(u) * s._LN_QUANT).cast("bigint").cast("double")
        / F.col("n_chars")
    )
    w = Window.partitionBy().orderBy(F.desc(pri), "doc_id")
    want = [
        (r.rank, r.doc_id)
        for r in docs.select(
            F.row_number().over(w).cast("bigint").alias("rank"), "doc_id"
        )
        .filter(F.col("rank") <= s.WEIGHTED_N)
        .orderBy("rank")
        .collect()
    ]
    assert got == want and len(got) == s.WEIGHTED_N


def test_weighted_sample_is_length_biased(spark):
    """With w = n_chars, the sample's mean length must exceed the
    corpus mean — the defining property of weighted inclusion (a
    uniform sampler fails this with overwhelming probability)."""
    samp = sampling.weighted_sample(spark, SF_DIR_ORACLE)
    m_samp = samp.agg(F.avg("n_chars")).collect()[0][0]
    m_all = (
        load(spark, SF_DIR_ORACLE, "documents")
        .filter(F.col("n_chars") > 0)
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert m_samp > m_all


def test_split_plan_is_narrow(spark):
    """split_assign before its presentation sort must be a pure
    projection: no Exchange, no Join, no Window."""
    docs = load(spark, SF_DIR_ORACLE, "documents")
    import bike_analyzer_spark.operators.sampling as s

    bucket = s.hash64(F.col("doc_id").cast("string"), s._SPLIT_SALT) % 100
    df = docs.select(
        "doc_id",
        F.when(bucket < s.TRAIN_PCT, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Join", "Window"):
        assert bad not in plan
