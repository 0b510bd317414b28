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
