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


def test_kn_python_replay_and_normalization(spark):
    """Interpolated Kneser-Ney replayed scalar-side: (1) the model
    is a proper conditional distribution — sum_w2 P_KN(w2|w1) = 1
    for every history (the identity the D*n1p/c1 interpolation
    weight exists to guarantee); (2) per-doc bits agree with the
    engine within one 1e-4 display-grid step (the replay uses libm
    log2, the engine JVM log2 — same accepted ulp class as the
    module's add-one model)."""
    import math
    from collections import Counter

    rows = (
        lm.load(spark, SF_DIR_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    )
    toks = {r.doc_id: r.text.strip().split() for r in rows}
    bgs = {
        d: [(t[i], t[i + 1]) for i in range(len(t) - 1)]
        for d, t in toks.items()
        if len(t) >= 2
    }
    c2 = Counter(b for bl in bgs.values() for b in bl)
    c1, n1p_w1, n1p_w2 = Counter(), Counter(), Counter()
    for (a, b), c in c2.items():
        c1[a] += c
        n1p_w1[a] += 1
        n1p_w2[b] += 1
    n1p_all = len(c2)

    # (1) normalization: for every history w1, the discounted mass
    # plus the redistributed continuation mass sums to exactly 1
    by_w1: dict = {}
    for (a, b), c in c2.items():
        by_w1.setdefault(a, []).append((b, c))
    for a, conts in by_w1.items():
        total = sum(
            (c - 0.75) / c1[a]
            + 0.75 * n1p_w1[a] / c1[a] * n1p_w2[b] / n1p_all
            for b, c in conts
        )
        # continuation mass of NON-followers of a completes the sum
        rest = sum(
            0.75 * n1p_w1[a] / c1[a] * n1p_w2[b] / n1p_all
            for b in n1p_w2
            if (a, b) not in c2
        )
        assert abs(total + rest - 1.0) < 1e-9, f"history {a!r} leaks mass"

    # (2) per-doc bits vs the engine, same num/den formulation
    want = {}
    for d, bl in bgs.items():
        ubits = 0
        for a, b in bl:
            num = (4 * c2[(a, b)] - 3) * n1p_all + 3 * n1p_w1[a] * n1p_w2[b]
            den = 4 * c1[a] * n1p_all
            ubits += round((math.log2(den) - math.log2(num)) * 1_000_000)
        want[d] = ubits / len(bl) / 1_000_000
    got = {
        r.doc_id: r.kn_bits_per_bigram
        for r in lm.lm_kn_doc_bits(spark, SF_DIR_SMOKE).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) <= 2e-4, (d, got[d], want[d])
