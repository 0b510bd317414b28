"""Streaming PSI monitor: batch/stream parity against the frozen
baseline, exactly-once replay, and crash-replay idempotence."""

import glob

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.sources.catalog import load
from bike_analyzer_spark.streaming.driftserve import (
    baseline_counts,
    batch_psi,
    run_drift_to_parquet,
)
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture()
def landed_shards(spark, tmp_path):
    """The sf0.001 events split into 3 landed shard files."""
    landing = str(tmp_path / "landing")
    (
        load(spark, SF_DIR_SMOKE, "events")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(landing)
    )
    return landing


def _rows(spark, out):
    return {
        (r.batch_id, r.event_type, r.n_first, r.n_second, r.psi_contrib)
        for r in spark.read.parquet(out).collect()
    }


def test_stream_reports_match_per_shard_batch(
    spark, tmp_path, landed_shards
):
    """One report per landed shard, each equal to running the batch
    PSI code on that shard's file directly."""
    out = str(tmp_path / "reports")
    ckpt = str(tmp_path / "ckpt")
    run_drift_to_parquet(spark, SF_DIR_SMOKE, landed_shards, out, ckpt)
    got = _rows(spark, out)
    baseline = baseline_counts(spark, SF_DIR_SMOKE)
    want = set()
    shard_ids = set()
    for f in sorted(glob.glob(f"{landed_shards}/part-*.parquet")):
        shard = spark.read.parquet(f)
        # identify which batch_id this shard landed as by matching
        # its total row count in the '(all)' report rows
        n = shard.count()
        matches = [
            b for (b, et, _, n2, _) in got if et == "(all)" and n2 == n
        ]
        assert matches
        for r in batch_psi(shard, baseline).collect():
            want.add(
                (r.event_type, r.n_first, r.n_second, r.psi_contrib)
            )
        shard_ids.add(n)
    assert {(et, f1, f2, c) for (_, et, f1, f2, c) in got} == want
    n_batches = len({b for (b, *_rest) in got})
    assert n_batches == 3  # maxFilesPerTrigger=1 over 3 shards


def test_replay_is_noop_and_new_shard_scores_once(
    spark, tmp_path, landed_shards
):
    out = str(tmp_path / "reports")
    ckpt = str(tmp_path / "ckpt")
    run_drift_to_parquet(spark, SF_DIR_SMOKE, landed_shards, out, ckpt)
    first = _rows(spark, out)
    run_drift_to_parquet(spark, SF_DIR_SMOKE, landed_shards, out, ckpt)
    assert _rows(spark, out) == first
    # land one more shard; only it is scored, prior reports untouched
    (
        load(spark, SF_DIR_SMOKE, "events")
        .limit(40)
        .coalesce(1)
        .write.mode("append")
        .parquet(landed_shards)
    )
    run_drift_to_parquet(spark, SF_DIR_SMOKE, landed_shards, out, ckpt)
    after = _rows(spark, out)
    assert first < after
    new = after - first
    assert {b for (b, *_r) in new} == {3}
    assert ("(all)") in {et for (_, et, *_r) in new}


def test_uncommitted_batch_replay_is_idempotent(
    spark, tmp_path, landed_shards
):
    """Simulate a crash AFTER a batch's write but BEFORE its
    checkpoint commit: wiping the checkpoint and re-running must
    leave exactly one report set (overwrite-per-batch_id), modulo
    batch renumbering."""
    out = str(tmp_path / "reports")
    ckpt = str(tmp_path / "ckpt")
    run_drift_to_parquet(spark, SF_DIR_SMOKE, landed_shards, out, ckpt)
    first = {r[1:] for r in _rows(spark, out)}
    import shutil

    shutil.rmtree(ckpt)
    run_drift_to_parquet(
        spark, SF_DIR_SMOKE, landed_shards, out, str(tmp_path / "ck2")
    )
    assert {r[1:] for r in _rows(spark, out)} == first
