"""DSIR importance weighting: oracle parity, the integer-exactness
property the micro-nat design exists for, and the semantic sanity of
the target model (target-language docs must score higher)."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import importance
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(importance.QUERIES))
def test_importance_vs_oracle(spark, duck, name):
    df = importance.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, importance.ORACLES[name], name=name)


def test_selection_is_non_degenerate(spark):
    """The corpus-mean bar must split the corpus: some kept, some
    dropped — at BOTH fixture scales (a fixed threshold was degenerate
    at sf0.1, which is why the bar is self-calibrating)."""
    for sf in (SF_DIR_SMOKE, SF_DIR_ORACLE):
        rows = importance.dsir_select(spark, sf).collect()
        kept = sum(1 for r in rows if r.keep)
        assert 0 < kept < len(rows)


def test_target_language_scores_higher(spark):
    """The whole point of the weight: the target slice (lang='en')
    must average a higher per-token log-likelihood ratio than the
    non-target remainder."""
    w = importance.dsir_weights(spark, SF_DIR_ORACLE)
    docs = importance.load(spark, SF_DIR_ORACLE, "documents").select(
        "doc_id", "lang"
    )
    means = (
        w.join(docs, "doc_id")
        .withColumn("is_tgt", F.col("lang") == "en")
        .groupBy("is_tgt")
        .agg(F.avg("per_token").alias("m"))
        .collect()
    )
    by = {r.is_tgt: r.m for r in means}
    assert by[True] > by[False]


def test_weights_are_partitioning_invariant(spark):
    """Integer micro-nats: per-doc weights must be bit-identical under
    a hostile repartitioning (a double sum would drift in the last
    ulp and flip rounded values)."""
    a = {
        r.doc_id: (r.logratio, r.per_token)
        for r in importance.dsir_weights(spark, SF_DIR_SMOKE).collect()
    }
    docs = importance.load(spark, SF_DIR_SMOKE, "documents").repartition(
        7, "doc_id"
    )
    orig = importance.load
    importance.load = lambda s, d, n: docs
    try:
        b = {
            r.doc_id: (r.logratio, r.per_token)
            for r in importance.dsir_weights(spark, SF_DIR_SMOKE).collect()
        }
    finally:
        importance.load = orig
    assert a == b


def test_weights_reimplementation(spark, duck):
    """Independent scalar recomputation of a few docs' weights from
    raw bucket counts (no shared CTEs): guards the smoothing algebra
    itself, not just Spark/DuckDB agreement on it."""
    import collections
    import hashlib
    import math

    docs = [
        (r.doc_id, r.text, r.lang)
        for r in importance.load(spark, SF_DIR_SMOKE, "documents")
        .orderBy("doc_id")
        .limit(80)
        .collect()
    ]
    all_docs = [
        (r.doc_id, r.text, r.lang)
        for r in importance.load(spark, SF_DIR_SMOKE, "documents").collect()
    ]

    def bucket(w):
        h = hashlib.md5(f"{importance._SALT}:{w}".encode()).hexdigest()[:8]
        return int(h, 16) % importance.N_BUCKETS

    c_raw = collections.Counter()
    c_tgt = collections.Counter()
    for _, text, lang in all_docs:
        for w in text.strip().split():
            b = bucket(w)
            c_raw[b] += 1
            if lang == "en":
                c_tgt[b] += 1
    n_raw = sum(c_raw.values())
    n_tgt = sum(c_tgt.values())
    B = importance.N_BUCKETS
    lr = {
        b: round(
            (
                math.log((c_tgt[b] + 1) / (n_tgt + B))
                - math.log((c_raw[b] + 1) / (n_raw + B))
            )
            * importance.QUANT
        )
        for b in c_raw
    }
    got = {
        r.doc_id: r.logratio
        for r in importance.dsir_weights(spark, SF_DIR_SMOKE).collect()
    }
    for doc_id, text, _ in docs:
        unats = sum(lr[bucket(w)] for w in text.strip().split())
        assert got[doc_id] == round(unats / importance.QUANT, 6), doc_id
