"""Streaming HLL maintenance: the served estimate is bit-equal to
the batch sketch over the same events, replay publishes nothing
twice, and a late shard only ever RAISES register maxima."""

import pytest

from bike_analyzer_spark.operators.scale import hll_user_estimate
from bike_analyzer_spark.sources.catalog import load
from bike_analyzer_spark.streaming.hllserve import (
    run_hll_to_parquet,
    serve_hll,
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


def test_served_hll_matches_batch_sketch(spark, tmp_path, landed_shards):
    out = str(tmp_path / "regs")
    run_hll_to_parquet(spark, landed_shards, out, str(tmp_path / "ck"))
    served = serve_hll(spark, out).collect()[0]
    batch = hll_user_estimate(spark, SF_DIR_SMOKE).collect()[0]
    assert (served.m, served.filled) == (batch.m, batch.filled)
    assert served.hll_estimate == batch.hll_estimate  # bit-equal


def test_replay_noop_and_late_shard_monotone(
    spark, tmp_path, landed_shards
):
    out = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ck")
    run_hll_to_parquet(spark, landed_shards, out, ckpt)
    first = serve_hll(spark, out).collect()[0]
    # re-drain the same landing dir through the SAME checkpoint:
    # already-processed shards produce no new batches — a no-op
    run_hll_to_parquet(spark, landed_shards, out, ckpt)
    again = serve_hll(spark, out).collect()[0]
    assert tuple(first) == tuple(again)
    # a late shard of NEW users can only raise the estimate:
    # registers are max-merged, so the sketch is monotone
    (
        load(spark, SF_DIR_SMOKE, "events")
        .selectExpr(
            "event_id", "ts", "user_id + 1000000 AS user_id",
            "event_type", "value", "props",
        )
        .limit(200)
        .coalesce(1)
        .write.mode("append")
        .parquet(landed_shards)
    )
    run_hll_to_parquet(spark, landed_shards, out, ckpt)
    grown = serve_hll(spark, out).collect()[0]
    assert grown.filled >= first.filled
    assert grown.hll_estimate > first.hll_estimate
