"""Streaming ANN serving: batch/stream parity (same code path, same
results), exactly-once shard replay, and the partition-pruned probe
plan the persisted inverted lists exist for."""

import os

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import ivf
from bike_analyzer_spark.sources.catalog import load
from bike_analyzer_spark.streaming import annserve
from tests.conftest import SF_DIR_SMOKE


def _query_shards(spark, tmp_path, n_shards=2, per_shard=3):
    """Synthetic request shards: scaled copies of corpus vectors with
    fresh ids (so nothing collides with corpus vec_ids)."""
    base = (
        load(spark, SF_DIR_SMOKE, "embeddings")
        .orderBy("vec_id")
        .limit(n_shards * per_shard)
        .collect()
    )
    landing = tmp_path / "landing"
    landing.mkdir()
    all_rows = []
    for s in range(n_shards):
        rows = [
            (
                10_000 + s * per_shard + i,
                [x * 1.001 for x in base[s * per_shard + i].embedding],
            )
            for i in range(per_shard)
        ]
        all_rows.extend(rows)
        spark.createDataFrame(rows, annserve.QUERY_SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(str(landing / f"shard_{s}"))
    # flatten shard dirs into one landing dir of part files
    flat = tmp_path / "flat"
    flat.mkdir()
    n = 0
    for s in range(n_shards):
        for f in os.listdir(landing / f"shard_{s}"):
            if f.endswith(".parquet"):
                os.rename(
                    landing / f"shard_{s}" / f, flat / f"shard{s}_{n}.parquet"
                )
                n += 1
    return str(flat), all_rows


def test_streaming_matches_batch_topk(spark, tmp_path):
    flat, all_rows = _query_shards(spark, tmp_path)
    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")
    annserve.run_topk_to_parquet(spark, SF_DIR_SMOKE, flat, out, ckpt)
    served = sorted(
        map(tuple, spark.read.parquet(out).collect())
    )
    batch = sorted(
        map(
            tuple,
            ivf.topk_for(
                spark,
                SF_DIR_SMOKE,
                spark.createDataFrame(all_rows, annserve.QUERY_SCHEMA),
            ).collect(),
        )
    )
    assert served == batch
    assert len(served) > 0
    # every query got exactly TOP_K results
    per_q = {}
    for row in served:
        per_q[row[0]] = per_q.get(row[0], 0) + 1
    assert set(per_q.values()) == {ivf.TOP_K}
    assert len(per_q) == len(all_rows)


def test_replay_is_exactly_once(spark, tmp_path):
    flat, _ = _query_shards(spark, tmp_path, n_shards=1)
    out = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")
    annserve.run_topk_to_parquet(spark, SF_DIR_SMOKE, flat, out, ckpt)
    n1 = spark.read.parquet(out).count()
    # restart over the same landing dir: checkpoint must skip it all
    annserve.run_topk_to_parquet(spark, SF_DIR_SMOKE, flat, out, ckpt)
    assert spark.read.parquet(out).count() == n1


def test_probe_scan_is_partition_pruned(spark):
    """The reason the lists persist partitioned: the serving plan must
    carry a runtime pruning predicate on centroid_id (DPP), so a probe
    reads the probed centroid directories, not the corpus."""
    queries = (
        load(spark, SF_DIR_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    df = ivf.topk_for(spark, SF_DIR_SMOKE, queries)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
