"""Window-fingerprint substring dedup: oracle parity plus the
alignment guarantee the WIN/STRIDE choice exists for."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import substring
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(substring.QUERIES))
def test_substring_vs_oracle(spark, duck, name):
    df = substring.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, substring.ORACLES[name], name=name)


def test_detector_is_non_degenerate(spark):
    s = substring.span_dedup_stats(spark, SF_DIR_ORACLE)
    flagged = s.filter(F.col("n_dup") > 0).count()
    assert 0 < flagged < s.count()


def _stats_for(spark, docs):
    wins = substring._windows(docs)
    dup = substring._dup_hashes(wins).select(
        "h", F.lit(1).alias("_dup")
    )
    return {
        r.doc_id: r.n_dup
        for r in wins.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("_dup", F.lit(0))).alias("n_dup"))
        .collect()
    }


def _hash64_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_planted_shared_run_is_caught_at_any_alignment(spark):
    """The content-defined-anchor property: anchors are a function of
    run CONTENT, so a duplicated run is fingerprinted identically in
    every document containing it, WHATEVER its alignment (the
    position-aligned first version of this operator only matched
    copies at equal offsets mod STRIDE — this test caught it)."""
    import random

    rng = random.Random(42)
    run = "".join(
        rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 ")
        for _ in range(300)
    )
    # precondition: the run itself contains an anchored full window
    anchors = [
        i
        for i in range(len(run) - substring.WIN + 1)
        if _hash64_py(run[i : i + substring.ANCHOR_W]) % substring.STRIDE
        == 0
    ]
    assert anchors, "chosen run has no anchor — lengthen it"

    def filler(seed, n):
        r = random.Random(seed)
        return "".join(r.choice("ABCDEFGHIJKLMNOP") for _ in range(n))

    rows = [
        (100 + i, filler(i, off) + run + filler(i + 50, 40))
        for i, off in enumerate([0, 7, 19, 31])
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    stats = _stats_for(spark, docs)
    assert all(stats[d] >= 1 for d in stats), stats


def test_unique_docs_have_zero_dups(spark):
    rows = [
        (1, "".join(chr(ord("a") + (i * 11 + k) % 26) for k in range(200)))
        for i in range(1, 4)
        for _ in [0]
    ]
    rows = [(i, t + str(i) * 5) for (i, t) in rows]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    stats = _stats_for(spark, docs)
    assert all(v == 0 for v in stats.values()), stats


def test_short_docs_produce_no_windows(spark):
    """Sub-WIN docs contribute nothing (the guarded sequence());
    a WIN-length doc has exactly one candidate position, kept iff
    its probe anchors — cross-checked against the Python hash."""
    docs = spark.createDataFrame(
        [(1, "x" * (substring.WIN - 1)), (2, "y" * substring.WIN)],
        "doc_id: long, text: string",
    )
    wins = substring._windows(docs)
    per_doc = {
        r.doc_id: r.c
        for r in wins.groupBy("doc_id").agg(F.count("*").alias("c")).collect()
    }
    assert 1 not in per_doc
    expect_2 = (
        1
        if _hash64_py("y" * substring.ANCHOR_W) % substring.STRIDE == 0
        else None
    )
    assert per_doc.get(2) == expect_2
