"""Bigram-LM scoring: oracle parity plus the exactness property the
integer micro-bit design exists for."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import lm
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(lm.QUERIES))
def test_lm_vs_oracle(spark, duck, name):
    df = lm.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, lm.ORACLES[name], name=name)


def test_buckets_are_non_degenerate(spark):
    """All three CCNet buckets must be populated on the fixtures —
    a threshold drift that collapses the distribution should fail
    here, not silently grade everything 'head'."""
    rows = lm.lm_bucket_counts(spark, SF_DIR_ORACLE).collect()
    assert {r.lm_bucket for r in rows} == {"head", "middle", "tail"}


def test_scores_are_partitioning_invariant(spark):
    """The reason for integer micro-bits: per-doc scores must be
    bit-identical however the corpus is partitioned (a double sum
    would drift in the last ulp and flip rounded scores)."""
    a = {
        r.doc_id: r.bits_per_bigram
        for r in lm.lm_doc_bits(spark, SF_DIR_SMOKE).collect()
    }
    docs = (
        lm.load(spark, SF_DIR_SMOKE, "documents")
        .repartition(7, "doc_id")
    )
    bg = lm._doc_bigrams(docs)
    # recompute through the same pipeline on a hostile partitioning
    import bike_analyzer_spark.operators.lm as m

    orig = m.load
    m.load = lambda s, d, n: docs
    try:
        b = {
            r.doc_id: r.bits_per_bigram
            for r in lm.lm_doc_bits(spark, SF_DIR_SMOKE).collect()
        }
    finally:
        m.load = orig
    assert a == b
