"""Production state backend for the streaming pack: the RocksDB
state store provider (SURVEY.md §2.9 scale note).

The default HDFS-backed state store keeps every operator's state as
JVM-heap hash maps — fine for demos, fatal at 100-TB/day stream
volumes where join/session/dedup state (bounded by watermark x
traffic, not by stream length) still reaches tens of GB per
executor: the heap copy double-counts against execution memory and
full-snapshot checkpoints rewrite all of it every commit. RocksDB
(built into Spark since 3.2, no extra jars) moves state off-heap
onto local SSD with incremental changelog checkpointing — the
documented production choice for large-state pipelines.

The provider is a SESSION-level conf consumed at query START (each
StreamingQuery snapshots it; running queries are unaffected), so the
helper here is a context manager that flips it for the queries
started inside and restores the previous value after — letting one
test suite run the same query under both backends and pin result
equality plus the provider's own telemetry.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming."
    "state.RocksDBStateStoreProvider"
)
#: changelog checkpointing: commit deltas, snapshot in the background
#: (the incremental mode a long-running large-state query wants)
CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


@contextmanager
def rocksdb_state(spark: SparkSession):
    """Run the enclosed streaming-query starts under the RocksDB
    state store with changelog checkpointing; restore the prior
    provider on exit. State SEMANTICS are provider-independent (same
    keys, same watermark eviction) — only placement and checkpoint
    strategy change, which is why result parity is testable."""
    prev_provider = spark.conf.get(PROVIDER_CONF, None)
    prev_changelog = spark.conf.get(CHANGELOG_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB_PROVIDER)
    spark.conf.set(CHANGELOG_CONF, "true")
    try:
        yield spark
    finally:
        for key, prev in (
            (PROVIDER_CONF, prev_provider),
            (CHANGELOG_CONF, prev_changelog),
        ):
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
