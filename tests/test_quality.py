"""Corpus-quality pack: oracle parity for all four queries, rule
consistency, decontamination correctness against an independent
Python recomputation, TF-IDF ranking contract, and the broadcast-join
plan contract for decontam (the 100 TB shape)."""

import math

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import quality
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(quality.QUERIES))
def test_quality_vs_oracle(spark, duck, name):
    df = quality.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, quality.ORACLES[name], name=name)


def test_keep_is_conjunction_of_rules(spark):
    rows = quality.text_quality_rules(spark, SF_DIR_ORACLE).collect()
    assert rows
    kept = 0
    for r in rows:
        assert r.keep == (
            r.rule_word_count
            and r.rule_mean_word_len
            and r.rule_symbol_ratio
            and r.rule_stopwords
            and r.rule_repetition
        )
        kept += int(r.keep)
    # the filter must actually discriminate on this corpus
    assert 0 < kept < len(rows)


def test_repetition_ratios_bounded(spark):
    rows = quality.text_repetition(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 < r.uniq_bigram_ratio <= 1
        assert 0 < r.top_bigram_ratio <= 1
        assert 0 <= r.dup_trigram_ratio < 1
        # top bigram can't be rarer than 1/n or commoner than
        # implied by the distinct count
        assert r.top_bigram_ratio >= round(1.0 / r.n_bigrams, 4) - 1e-9


def _py_shingles(text: str, n: int) -> set:
    toks = text.strip().split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def test_decontam_matches_python_recompute(spark):
    """Independent recomputation: set-intersection per doc in plain
    Python must agree with the Spark broadcast-join result."""
    docs = {
        r.doc_id: r.text
        for r in load(spark, SF_DIR_ORACLE, "documents").collect()
    }
    eval_sh = set()
    for did, text in docs.items():
        if did % quality.EVAL_MOD == 0:
            eval_sh |= _py_shingles(text, quality.DECONTAM_NGRAM)
    expect = {}
    for did, text in docs.items():
        if did % quality.EVAL_MOD == 0:
            continue
        sh = _py_shingles(text, quality.DECONTAM_NGRAM)
        hit = sh & eval_sh
        if hit:
            expect[did] = len(hit)
    got = {
        r.doc_id: r.n_matched
        for r in quality.decontam_overlap(spark, SF_DIR_ORACLE).collect()
    }
    assert got == expect
    assert expect, "corpus produced no contamination — test is vacuous"


def test_decontam_plan_broadcasts_eval(spark):
    plan = (
        quality.decontam_overlap(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_ranking_contract(spark):
    """Per doc: ranks are 1..k (k<=3) with scores non-increasing and
    term-ascending within equal scores; scores match tf*ln(N/df)."""
    rows = quality.tfidf_top_terms(spark, SF_DIR_ORACLE).collect()
    assert rows
    n_docs = load(spark, SF_DIR_ORACLE, "documents").count()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # recompute df for the terms that appear
    docs = load(spark, SF_DIR_ORACLE, "documents").collect()
    df_count = {}
    for d in docs:
        for t in set(d.text.strip().split()):
            df_count[t] = df_count.get(t, 0) + 1
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert (a.score, b.term) >= (b.score, a.term) or a.score > b.score
        for r in rs:
            assert r.term not in quality.STOPWORDS
            want = round(r.tf * math.log(n_docs / df_count[r.term]), 4)
            assert abs(r.score - want) < 1e-9


def test_ngram_novelty_vs_oracle(spark, duck):
    df = quality.ngram_novelty(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, quality.ORACLES["ngram_novelty"], name="ngram_novelty"
    )


def test_ngram_novelty_invariants(spark):
    rows = quality.ngram_novelty(spark, SF_DIR_ORACLE).collect()
    assert rows, "novelty profile must cover the corpus"
    by_id = sorted(rows, key=lambda r: r.doc_id)
    # the earliest doc owns every one of its shingles by definition
    first = by_id[0]
    assert first.n_novel == first.n_shingles
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
        assert 0.0 <= r.novelty_pct <= 100.0
    # every shingle has exactly one owner: novel counts sum to the
    # global distinct-shingle count
    import pyspark.sql.functions as F
    from bike_analyzer_spark.functions.textfns import (
        shingle_exprs,
        tokens,
    )
    from bike_analyzer_spark.sources.catalog import load

    docs = (
        load(spark, SF_DIR_ORACLE, "documents")
        .withColumn("toks", tokens("text"))
        .filter(F.size("toks") >= quality.NOVELTY_NGRAM)
    )
    n_distinct = (
        docs.select(
            F.explode(
                shingle_exprs("toks", n=quality.NOVELTY_NGRAM)
            ).alias("sh")
        )
        .agg(F.countDistinct("sh"))
        .first()[0]
    )
    assert sum(r.n_novel for r in rows) == n_distinct


def test_source_overlap_matrix_vs_oracle(spark, duck):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(
        quality.source_overlap_matrix(spark, SF_DIR_ORACLE),
        duck,
        quality.ORACLES["source_overlap_matrix"],
        "source_overlap_matrix",
    )


def test_source_overlap_containment_asymmetry(spark):
    """A small source quoted inside a big one: cont(small->big) is
    high while cont(big->small) and Jaccard stay low — the asymmetric
    signal the matrix exists to surface."""
    quote = "to be or not to be that is the question"
    filler = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, quote, "en", "small", 0),
        (2, f"{filler} {quote}", "en", "big", 0),
        (3, f"{filler} more unrelated text here", "en", "big", 0),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    import os

    # route through the same load() contract the query uses
    from pyspark.sql import functions as F

    ss = (
        docs.withColumn("toks", quality.tokens("text"))
        .select(
            "source",
            F.explode(
                quality.shingle_exprs("toks", quality.DECONTAM_NGRAM)
            ).alias("sh"),
        )
        .distinct()
    )
    small = {r.sh for r in ss.filter(F.col("source") == "small").collect()}
    big = {r.sh for r in ss.filter(F.col("source") == "big").collect()}
    shared = len(small & big)
    assert shared == len(small)  # fully contained
    assert len(big) > 3 * len(small)
