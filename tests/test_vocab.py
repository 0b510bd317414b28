"""Corpus vocabulary statistics: oracle parity plus internal
consistency between the summary and the head."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import vocab
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(vocab.QUERIES))
def test_vocab_vs_oracle(spark, duck, name):
    df = vocab.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, vocab.ORACLES[name], name=name)


def test_summary_consistent_with_term_table(spark):
    """The 1-row summary must agree with a direct recount of the
    vocabulary-sized term table it aggregates."""
    s = vocab.vocab_summary(spark, SF_DIR_ORACLE).collect()[0]
    tf = vocab._term_freqs(spark, SF_DIR_ORACLE).collect()
    assert s.vocab_size == len(tf)
    assert s.total_tokens == sum(r.freq for r in tf)
    assert s.hapax_count == sum(1 for r in tf if r.freq == 1)
    assert 0 < s.type_token_ratio < 1
    assert s.hapax_count < s.vocab_size


def test_head_is_ranked_and_bounded(spark):
    rows = vocab.vocab_top_terms(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == vocab.TOP_TERMS
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    # Zipf head: the most frequent term carries a visible ppm share
    assert rows[0].ppm > rows[-1].ppm > 0


def test_heaps_curve_python_replay(spark):
    """Full python recount of the cumulative-distinct curve at
    sf0.001: sequential scan over docs in doc_id order, growing a
    shingle set, checkpointed at each decile cutoff."""
    from tests.conftest import SF_DIR_SMOKE
    from bike_analyzer_spark.sources.catalog import load

    docs = sorted(
        (r.doc_id, r.text)
        for r in load(spark, SF_DIR_SMOKE, "documents").collect()
    )
    n = len(docs)
    # the decile arithmetic assumes dense ids 0..n-1 (the testdata
    # contract the docstring cites) — assert it before relying on it
    assert [d for d, _ in docs] == list(range(n))
    seen: set[str] = set()
    occ = 0
    want = []
    cut = {(d * n) // 10: d for d in range(1, 11)}
    for doc_id, text in docs:
        toks = text.split()
        shingles = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        occ += len(shingles)
        seen.update(shingles)
        if doc_id + 1 in cut:
            d = cut[doc_id + 1]
            want.append((10 * d, doc_id + 1, occ, len(seen)))
    got = [
        (r.pct, r.docs_seen, r.shingles_seen, r.vocab_seen)
        for r in vocab.vocab_heaps_curve(spark, SF_DIR_SMOKE).collect()
    ]
    assert got == want


def test_heaps_curve_is_sublinear(spark):
    """vocab growth must be monotone and Heaps-sublinear: the fitted
    log-log slope between the 10% and 100% checkpoints lies in
    (0, 1)."""
    import math

    rows = vocab.vocab_heaps_curve(spark, SF_DIR_ORACLE).collect()
    assert [r.pct for r in rows] == [10 * i for i in range(1, 11)]
    for a, b in zip(rows, rows[1:]):
        assert b.vocab_seen >= a.vocab_seen
        assert b.shingles_seen > a.shingles_seen
    beta = math.log(rows[-1].vocab_seen / rows[0].vocab_seen) / math.log(
        rows[-1].shingles_seen / rows[0].shingles_seen
    )
    assert 0.0 < beta < 1.0, beta
