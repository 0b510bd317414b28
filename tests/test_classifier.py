"""NB quality classifier: oracle parity, model sanity, and agreement
between the learned score and the rule labels it distills."""

import pytest

from bike_analyzer_spark.operators import classifier
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(classifier.QUERIES))
def test_classifier_vs_oracle(spark, duck, name):
    df = classifier.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, classifier.ORACLES[name], name=name)


def test_model_head_bounded_and_ranked(spark):
    rows = classifier.nbq_model(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == classifier.MODEL_HEAD
    mags = [abs(r.log_odds) for r in rows]
    assert mags == sorted(mags, reverse=True)
    # discriminative at all: head buckets separate the classes
    assert mags[0] > 0


def test_select_classes_nondegenerate_and_correlated(spark):
    """The verdict must not collapse to one class, and the learned
    score must agree with its own training labels far above chance —
    NB distilling five conjunctive gates should reconstruct most
    verdicts (if this drops near 0.5 the features or labels broke)."""
    rows = classifier.nbq_select(spark, SF_DIR_ORACLE).collect()
    kept = sum(r.keep_nb for r in rows)
    assert 0 < kept < len(rows)
    agree = sum(r.keep_nb == r.keep_rule for r in rows) / len(rows)
    assert agree > 0.7, f"rule/model agreement {agree:.2f}"
    # scores actually order the classes: mean positive-label score
    # exceeds mean negative-label score
    pos = [r.log_odds for r in rows if r.keep_rule]
    neg = [r.log_odds for r in rows if not r.keep_rule]
    assert pos and neg
    assert sum(pos) / len(pos) > sum(neg) / len(neg)


def test_no_corpus_wide_shuffle_beyond_buckets(spark):
    """Scoring joins the B-row model via broadcast; no SortMergeJoin
    or cartesian over the corpus."""
    plan = (
        classifier.nbq_select(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
