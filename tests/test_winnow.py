"""Winnowing fingerprint dedup — oracle differential + the SIGMOD'03
local-match guarantee + selection-math pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from bike_analyzer_spark.operators import winnow
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_winnow_vs_oracle(spark, duck):
    assert_matches_oracle(
        winnow.dedup_winnowing(spark, SF_DIR_ORACLE),
        duck,
        winnow.ORACLES["dedup_winnowing"],
        "dedup_winnowing",
    )


def test_local_match_guarantee(spark):
    """Two documents sharing a token run of length >= W + K - 1 (= 6)
    MUST share a fingerprint — the winnowing guarantee — regardless
    of the unrelated text around it."""
    shared = "the quick brown fox jumps over"  # 6 tokens
    rows = [
        (1, f"completely unrelated opening words here {shared} tail one"),
        (2, f"{shared} and then something else entirely follows after"),
        # a doc with NO shared run
        (3, "nothing in common with either document at all whatsoever"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        d: {r.fp for r in rows_}
        for d, rows_ in (
            (d, winnow.winnow_fingerprints(docs)
                .filter(F.col("doc_id") == d)
                .collect())
            for d in (1, 2, 3)
        )
    }
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    cands = {
        (r.a, r.b) for r in winnow.winnow_pairs(docs).collect()
    }
    # the pair shares 4 of ~17 shingles -> Jaccard above the 1/20
    # floor, so the verified output must surface it
    assert (1, 2) in cands
    assert not any(3 in p for p in cands)


def test_identical_docs_score_full(spark):
    docs = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (11, "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    out = winnow.winnow_pairs(docs).collect()
    assert len(out) == 1
    assert out[0].a == 10 and out[0].b == 11
    assert out[0].jacc_bp == 10000


def test_fingerprint_density_and_short_doc(spark):
    """Selection math: a doc with fewer k-grams than the window keeps
    exactly ONE fingerprint (the truncated pos-1 window); fingerprint
    count never exceeds full-window count."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),  # 2 k-grams < W -> single window
            (2, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),  # 10 k-grams
        ],
        "doc_id long, text string",
    )
    fps = winnow.winnow_fingerprints(docs)
    n1 = fps.filter(F.col("doc_id") == 1).count()
    assert n1 == 1
    n2 = fps.filter(F.col("doc_id") == 2).count()
    # 10 k-grams -> 7 full windows, each selecting one of <=10 grams;
    # consecutive windows usually agree, so distinct fps <= 7
    assert 1 <= n2 <= 7
