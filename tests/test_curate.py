"""Composed curation pipeline: oracle parity, stage consistency with
the standalone operators, and the one-shuffle plan contract."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import curate, sampling, text
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_curate_vs_oracle(spark, duck):
    df = curate.curate_keep_list(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, curate.ORACLES["curate_keep_list"], name="curate_keep_list"
    )


def test_stages_agree_with_standalone_operators(spark):
    """Every kept doc must carry exactly the standalone operators'
    verdicts: text_stats' quality_score, text_langid's prediction,
    split_assign's split — composition changes the plan, not the
    answers."""
    kept = {
        r.doc_id: (r.quality_score, r.lang_pred, r.split)
        for r in curate.curate_keep_list(spark, SF_DIR_ORACLE).collect()
    }
    stats = {
        r.doc_id: r.quality_score
        for r in text.text_stats(spark, SF_DIR_ORACLE).collect()
    }
    langs = {
        r.doc_id: r.lang_pred
        for r in text.text_langid(spark, SF_DIR_ORACLE).collect()
    }
    splits = {
        r.doc_id: r.split
        for r in sampling.split_assign(spark, SF_DIR_ORACLE).collect()
    }
    assert len(kept) > 0
    for doc_id, (q, lang, split) in kept.items():
        assert q == stats[doc_id] and q >= curate.QUALITY_MIN
        assert lang == langs[doc_id] and lang != "und"
        assert split == splits[doc_id]


def test_rejected_docs_fail_a_gate(spark):
    """Docs absent from the keep-list either failed a gate or lost
    the dedup keep decision (corpus has no exact dups, so here:
    failed a gate)."""
    kept = {
        r.doc_id
        for r in curate.curate_keep_list(spark, SF_DIR_ORACLE).collect()
    }
    stats = {
        r.doc_id: r.quality_score
        for r in text.text_stats(spark, SF_DIR_ORACLE).collect()
    }
    langs = {
        r.doc_id: r.lang_pred
        for r in text.text_langid(spark, SF_DIR_ORACLE).collect()
    }
    rejected = set(stats) - kept
    assert rejected, "thresholds should reject something"
    for doc_id in rejected:
        assert stats[doc_id] < curate.QUALITY_MIN or langs[doc_id] == "und"


def test_single_shuffle_plan(spark):
    """The composed pipeline must shuffle exactly once (the dedup
    window over md5) before the presentation sort."""
    df = curate.curate_keep_list(spark, SF_DIR_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # presentation orderBy adds one rangepartitioning exchange; the
    # body must contribute exactly one hashpartitioning exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_data_card_vs_oracle(spark, duck):
    assert_matches_oracle(
        curate.source_data_card(spark, SF_DIR_ORACLE),
        duck,
        curate.ORACLES["source_data_card"],
        name="source_data_card",
    )


def test_data_card_consistent_with_standalone_operators(spark):
    """Each card column re-derives from the operator that owns its
    arithmetic: quality.text_quality_rules (keep), text.text_langid
    (language mix), dedup_exact's md5 identity (dup rate)."""
    from collections import Counter, defaultdict

    from bike_analyzer_spark.operators import dedup, quality

    src = {
        r.doc_id: r.source
        for r in spark.read.parquet(
            f"{SF_DIR_ORACLE}/documents.parquet"
        )
        .select("doc_id", "source")
        .collect()
    }
    keep = Counter()
    for r in quality.text_quality_rules(spark, SF_DIR_ORACLE).collect():
        if r.keep:
            keep[src[r.doc_id]] += 1
    langs = defaultdict(Counter)
    for r in text.text_langid(spark, SF_DIR_ORACLE).collect():
        langs[src[r.doc_id]][r.lang_pred] += 1
    # dedup_exact is corpus-global; recompute per-source md5 sets
    import hashlib

    uniq = defaultdict(set)
    ndocs = Counter()
    for r in (
        spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
        .select("source", "text")
        .collect()
    ):
        ndocs[r.source] += 1
        uniq[r.source].add(hashlib.md5(r.text.encode()).hexdigest())
    card = curate.source_data_card(spark, SF_DIR_ORACLE).collect()
    assert {r.source for r in card} == set(ndocs)
    for r in card:
        s = r.source
        assert r.n_docs == ndocs[s]
        assert round(r.keep_pct * ndocs[s]) == 100 * keep[s]
        assert round(r.en_pct * ndocs[s]) == 100 * langs[s]["en"]
        assert round(r.und_pct * ndocs[s]) == 100 * langs[s]["und"]
        assert round(r.exact_dup_pct * ndocs[s]) == 100 * (
            ndocs[s] - len(uniq[s])
        )


def test_corpus_build_card_vs_oracle(spark, duck):
    df = curate.corpus_build_card(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df,
        duck,
        curate.ORACLES["corpus_build_card"],
        name="corpus_build_card",
    )


def test_corpus_build_card_matches_pipeline_audit(spark, tmp_path):
    """The card recomputes the funnel `pipeline.run_corpus_build`
    reports from its observed metrics — the two must agree on every
    shared number (docs in, kept after gates+dedup, train/val)."""
    from bike_analyzer_spark import pipeline

    audit = pipeline.run_corpus_build(
        spark, SF_DIR_ORACLE, str(tmp_path / "corpus"), n_shards=2
    )
    card = {
        r.stage: r
        for r in curate.corpus_build_card(spark, SF_DIR_ORACLE).collect()
    }
    assert card["2_quality_gate"].rows_in == audit["docs_in"]
    assert card["3_exact_dedup"].rows_out == audit["docs_kept"]
    assert card["4_split_train"].rows_out == audit["train_rows"]
    assert card["5_split_val"].rows_out == audit["val_rows"]


def test_corpus_build_card_funnel_is_monotone(spark):
    rows = {
        r.stage: r
        for r in curate.corpus_build_card(spark, SF_DIR_ORACLE).collect()
    }
    assert set(rows) == {
        "1_scrub_pii",
        "2_quality_gate",
        "3_exact_dedup",
        "4_split_train",
        "5_split_val",
    }
    for r in rows.values():
        assert 0 <= r.rows_out <= r.rows_in
        assert r.docs_affected >= 0
    # stages chain: each stage's input is the previous stage's output
    assert rows["2_quality_gate"].rows_in == rows["1_scrub_pii"].rows_out
    assert rows["3_exact_dedup"].rows_in == rows["2_quality_gate"].rows_out
    assert rows["4_split_train"].rows_in == rows["3_exact_dedup"].rows_out
    assert (
        rows["4_split_train"].rows_out + rows["5_split_val"].rows_out
        == rows["3_exact_dedup"].rows_out
    )
