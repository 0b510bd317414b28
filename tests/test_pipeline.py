"""End-to-end corpus build: stage consistency, deterministic reruns
(byte-identical versions), and versioned publish."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark import pipeline
from bike_analyzer_spark.operators.quality import rule_flags
from bike_analyzer_spark.operators.scrub import scrub_flags
from bike_analyzer_spark.sources import versioned
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_SMOKE


def test_curated_docs_stage_consistency(spark):
    docs = pipeline.curated_docs(spark, SF_DIR_SMOKE)
    rows = docs.collect()
    assert 0 < len(rows) < load(spark, SF_DIR_SMOKE, "documents").count()
    # every surviving text passes the gates AND is PII-free
    flagged = rule_flags(
        docs.select("doc_id", "text")
    ).filter("NOT keep")
    assert flagged.count() == 0
    pii = scrub_flags(docs.select("doc_id", "text")).filter(
        (F.col("n_urls") > 0) | (F.col("n_emails") > 0)
        | (F.col("n_phones") > 0)
    )
    assert pii.count() == 0
    # exact dedup held
    assert (
        docs.groupBy(F.md5("text")).count().filter("count > 1").count()
        == 0
    )
    # both splits present and disjoint by construction
    splits = {r.split for r in docs.select("split").distinct().collect()}
    assert splits == {"train", "val"}


def test_build_publishes_versions_and_reruns_identically(spark, tmp_path):
    table = str(tmp_path / "corpus")
    out1 = pipeline.run_corpus_build(spark, SF_DIR_SMOKE, table)
    assert out1["version"] == 1
    assert out1["train_rows"] + out1["val_rows"] == out1["docs_kept"]
    assert 0 < out1["train_rows"] <= out1["docs_kept"]
    v1 = {
        (r.doc_id, r.text)
        for r in versioned.read(spark, table, 1).collect()
    }
    assert len(v1) == out1["train_rows"]

    out2 = pipeline.run_corpus_build(spark, SF_DIR_SMOKE, table)
    assert out2["version"] == 2
    v2 = {
        (r.doc_id, r.text)
        for r in versioned.read(spark, table, 2).collect()
    }
    assert v2 == v1  # deterministic end-to-end: rerun == same corpus
    assert out2["train_rows"] == out1["train_rows"]


def test_audit_metrics_ride_the_write_pass(spark, tmp_path):
    """The observed-metrics audit agrees with the published version:
    counting never needed a second corpus scan."""
    table = str(tmp_path / "corpus_obs")
    out = pipeline.run_corpus_build(spark, SF_DIR_SMOKE, table)
    assert out["docs_kept"] == out["train_rows"] + out["val_rows"]
    assert out["min_text_len"] >= 1  # the CHECK constraint's floor
    direct = pipeline.curated_docs(spark, SF_DIR_SMOKE)
    assert out["docs_kept"] == direct.count()
    assert out["train_rows"] == direct.filter("split = 'train'").count()
