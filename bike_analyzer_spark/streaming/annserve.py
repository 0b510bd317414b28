"""Streaming ANN serving — the online face of the IVF index: query
vectors land continuously (an inference service's lookup requests, a
nightly batch of new documents to link against the corpus), each
micro-batch probes the PERSISTED inverted lists, and top-k results
append exactly-once to the results store.

This is why `ivf.inverted_lists` persists the index partitioned by
centroid_id: the serving join prunes the corpus scan to the probed
centroid directories at runtime (dynamic partition pruning —
plan-verified), so a micro-batch of Q queries touches ~Q * N_PROBE
lists, never the corpus. The probe logic is `ivf.topk_for` — the
SAME code path the batch `sim_ivf_topk` query uses, so batch and
streaming cannot drift (parity-tested).

State: ZERO. The index is the store; queries are stateless lookups;
the checkpoint gives exactly-once file-level semantics (a restart
over already-served shards appends nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.ivf import (
    _assigned,
    _centroid_row,
    _index_centroids,
    _lists_schema,
    topk_for,
)
from ..operators.similarity import _with_norm
from ..sources.catalog import load

#: pinned request schema: streaming sources never infer
QUERY_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def vector_query_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over landed query-vector shards (one shard
    per trigger — a request batch = a micro-batch)."""
    return (
        spark.readStream.schema(QUERY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )


def run_topk_to_parquet(
    spark: SparkSession,
    sf_dir: str,
    landing_dir: str,
    out_path: str,
    checkpoint: str,
) -> None:
    """Drain every landed query shard through the persisted IVF index
    (availableNow) and append (query_id, neighbor_id, cos, rank) to
    the results store, exactly-once per shard via the checkpoint."""

    def _serve(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        topk_for(spark, sf_dir, batch_df).write.mode("append").parquet(
            out_path
        )

    q = (
        vector_query_stream(spark, landing_dir)
        .writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_index_ingest(
    spark: SparkSession,
    sf_dir: str,
    landing_dir: str,
    index_path: str,
    checkpoint: str,
) -> None:
    """Index MAINTENANCE — the write path next to `run_topk_to_parquet`'s
    read path: newly embedded vectors land continuously, each
    micro-batch is assigned under the FROZEN trained centroids (the
    standard IVF maintenance contract: the coarse quantizer retrains
    offline on a schedule, arrivals between retrains file into the
    existing lists), and appends to a caller-owned partitioned lists
    store. Exactly-once per shard via the checkpoint; the store is
    immediately servable with `serve_index` / `ivf.topk_for`."""
    cents_row = _centroid_row(
        _index_centroids(
            spark, sf_dir, _with_norm(load(spark, sf_dir, "embeddings"))
        )
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            _assigned(
                _with_norm(
                    batch_df.withColumnRenamed("query_id", "vec_id")
                ),
                cents_row,
            )
            .select("vec_id", "embedding", "norm", "centroid_id")
            .write.mode("append")
            .partitionBy("centroid_id")
            .parquet(index_path)
        )

    q = (
        vector_query_stream(spark, landing_dir)
        .writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def serve_index(
    spark: SparkSession,
    sf_dir: str,
    queries: DataFrame,
    index_path: str,
) -> DataFrame:
    """Top-k against a streaming-maintained lists store (same probe
    path as the corpus queries; same partition-pruned scan shape)."""
    lists = spark.read.schema(_lists_schema()).parquet(index_path)
    return topk_for(spark, sf_dir, queries, lists=lists)
