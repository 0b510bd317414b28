"""Streaming quality scoring: batch/stream parity under the frozen
persisted model, and exactly-once replay."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import classifier
from bike_analyzer_spark.sources.catalog import load
from bike_analyzer_spark.streaming.qualityserve import run_score_to_parquet
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture()
def landed_shards(spark, tmp_path):
    """The sf0.001 documents split into 3 landed shard files."""
    landing = str(tmp_path / "landing")
    (
        load(spark, SF_DIR_SMOKE, "documents")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(landing)
    )
    return landing


def test_stream_scores_match_batch(spark, tmp_path, landed_shards):
    out = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    run_score_to_parquet(spark, SF_DIR_SMOKE, landed_shards, out, ckpt)
    streamed = {
        (r.doc_id, r.log_odds, r.keep_nb, r.keep_rule)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r.doc_id, r.log_odds, r.keep_nb, r.keep_rule)
        for r in classifier.nbq_select(spark, SF_DIR_SMOKE).collect()
    }
    assert streamed == batch
    assert len(streamed) == len(batch) > 0


def test_replay_appends_nothing_new_shard_scores_once(
    spark, tmp_path, landed_shards
):
    out = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    run_score_to_parquet(spark, SF_DIR_SMOKE, landed_shards, out, ckpt)
    n1 = spark.read.parquet(out).count()
    # replay over the same shards: checkpoint makes it a no-op
    run_score_to_parquet(spark, SF_DIR_SMOKE, landed_shards, out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # a shard landed AFTER the first drain is scored exactly once,
    # under the same frozen model (no retrain on arrival)
    (
        load(spark, SF_DIR_SMOKE, "documents")
        .limit(7)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .coalesce(1)
        .write.mode("append")
        .parquet(landed_shards)
    )
    run_score_to_parquet(spark, SF_DIR_SMOKE, landed_shards, out, ckpt)
    scored = spark.read.parquet(out)
    assert scored.count() == n1 + 7
    assert scored.filter(F.col("doc_id") >= 1_000_000).count() == 7


def test_uncommitted_batch_replay_is_idempotent(
    spark, tmp_path, landed_shards
):
    """foreachBatch is at-least-once: a crash AFTER the batch write
    but BEFORE the checkpoint commit re-runs the batch on restart.
    The per-batch_id overwrite sink must absorb that replay without
    duplicating scores (round-7 ADVICE) — simulated by deleting the
    checkpoint's commit record and re-draining."""
    import os
    import shutil

    out = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    run_score_to_parquet(spark, SF_DIR_SMOKE, landed_shards, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    # simulate the crash window: the sink wrote, the commit didn't
    shutil.rmtree(os.path.join(ckpt, "commits"))
    run_score_to_parquet(spark, SF_DIR_SMOKE, landed_shards, out, ckpt)
    replayed = spark.read.parquet(out)
    assert replayed.count() == n1
    assert replayed.select("doc_id").distinct().count() == n1
