"""Bigram-PMI collocations: oracle parity plus a from-scratch Python
recount of the corpus bigram/unigram tables and the PMI ranking."""

import math
from collections import Counter

import duckdb

from bike_analyzer_spark.operators import vocab
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_vocab_bigram_pmi_vs_oracle(spark, duck):
    assert_matches_oracle(
        vocab.vocab_bigram_pmi(spark, SF_DIR_ORACLE),
        duck,
        vocab.ORACLES["vocab_bigram_pmi"],
        name="vocab_bigram_pmi",
    )


def test_bigram_pmi_matches_python_recount(spark):
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_DIR_ORACLE}/documents.parquet'"
        ).fetchall()
    ]
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = t.strip().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    tt, bb = sum(uni.values()), sum(bi.values())
    scored = sorted(
        (
            (
                round(
                    math.log(c12 * tt * tt / (bb * uni[w1] * uni[w2]))
                    * 1e6
                ),
                c12,
                w1,
                w2,
            )
            for (w1, w2), c12 in bi.items()
            if c12 >= vocab.MIN_PAIR_FREQ
        ),
        key=lambda x: (-x[0], -x[1], x[2], x[3]),
    )[: vocab.TOP_BIGRAMS]
    got = vocab.vocab_bigram_pmi(spark, SF_DIR_ORACLE).collect()
    assert len(got) == len(scored)
    for r, (pmi_u, c12, w1, w2) in zip(got, scored):
        assert (r.w1, r.w2, r.c12) == (w1, w2, c12)
        assert (r.c1, r.c2) == (uni[w1], uni[w2])
        # 1 micro-nat of libm-ln skew allowed at the round boundary
        assert abs(r.pmi_unats - pmi_u) <= 1
        assert r.pmi == r.pmi_unats / 1e6
