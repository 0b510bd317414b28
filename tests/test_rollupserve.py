"""Streaming continuous aggregate: the served rollup equals the
batch hypertable hour grain, replay publishes nothing twice, and a
late shard folds in incrementally."""

import pytest

from bike_analyzer_spark.operators.hypertable import hypertable_rollup
from bike_analyzer_spark.sources.catalog import load
from bike_analyzer_spark.streaming.rollupserve import (
    run_rollup_to_parquet,
    serve_rollup,
)
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture()
def landed_shards(spark, tmp_path):
    landing = str(tmp_path / "landing")
    (
        load(spark, SF_DIR_SMOKE, "events")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(landing)
    )
    return landing


def _hour_grain_batch(spark):
    """The batch cascade's hour rows, keyed like serve_rollup."""
    return {
        (r.bucket_us, r.event_type, r.n, r.sum_v, r.avg_v, r.min_v, r.max_v)
        for r in hypertable_rollup(spark, SF_DIR_SMOKE).collect()
        if r.grain == "hour"
    }


def test_served_rollup_matches_batch_cascade(
    spark, tmp_path, landed_shards
):
    out = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")
    run_rollup_to_parquet(spark, landed_shards, out, ckpt)
    served = {tuple(r) for r in serve_rollup(spark, out).collect()}
    assert served == _hour_grain_batch(spark)
    assert served


def test_replay_noop_and_late_shard_folds_in(
    spark, tmp_path, landed_shards
):
    out = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")
    run_rollup_to_parquet(spark, landed_shards, out, ckpt)
    first = {tuple(r) for r in serve_rollup(spark, out).collect()}
    run_rollup_to_parquet(spark, landed_shards, out, ckpt)
    assert {tuple(r) for r in serve_rollup(spark, out).collect()} == first

    # land a disjoint future-hour shard: the served rollup gains
    # exactly those hours, prior hours byte-identical
    late = load(spark, SF_DIR_SMOKE, "events").selectExpr(
        "event_id",
        "ts + INTERVAL 10000 HOURS AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    ).limit(50)
    late.coalesce(1).write.mode("append").parquet(landed_shards)
    run_rollup_to_parquet(spark, landed_shards, out, ckpt)
    after = {tuple(r) for r in serve_rollup(spark, out).collect()}
    assert first < after
    # prior-hour rows unchanged (new hours are disjoint)
    old_hours = {t[0] for t in first}
    assert {t for t in after if t[0] in old_hours} == first
