"""Streaming-serve batch twins (operators/streamserve.py): the
driver-gated batch queries and the REAL streaming surfaces they twin
must agree — the lateness audit row-for-row when buckets land as
ordered files, and the space-saving serve in the no-eviction regime
where the sketch is exact."""

import os
import shutil
import time
import uuid

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators.streamserve import (
    ABSENT,
    JITTER_MOD,
    audit_frame,
    heavy_hitters_serve,
)
from bike_analyzer_spark.sources.catalog import load
from bike_analyzer_spark.streaming import topk
from bike_analyzer_spark.streaming.joins import events_stream
from bike_analyzer_spark.streaming.lateaudit import (
    run_late_audit_to_parquet,
    serve_late_audit,
)
from tests.conftest import SF_DIR_SMOKE

DAY_US = 24 * 3600 * 1_000_000


@pytest.fixture()
def tdir():
    d = f"/root/repo/.pytest_cache/streamserve-{uuid.uuid4().hex[:8]}"
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _bucketed(spark, bucket_us, step_us):
    """Smoke events under the twin's jitter skew model, bucketed at
    the given width. The test uses DAY buckets (landed file count
    stays streaming-test-sized; the driver query uses hours) with
    the jitter step scaled to 6 h so the skew spans bucket
    boundaries — at the query's 15-min step no sf0.001 row crosses
    a day boundary by more than the allowance and every n_late is
    trivially zero."""
    return load(spark, SF_DIR_SMOKE, "events").select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        "props",
        F.expr("unix_micros(ts)").alias("us"),
        F.expr(
            f"(unix_micros(ts) + (event_id % {JITTER_MOD})"
            f" * {step_us}) div {bucket_us}"
        ).alias("bucket"),
    )


def test_late_audit_batch_twin_matches_stream(spark, tdir):
    """Landing one file per arrival bucket, in bucket order, the
    streaming audit's per-batch rows equal the batch twin's
    per-bucket rows exactly (n_rows, min/max event time, prior
    high-water mark, late count)."""
    ev = _bucketed(spark, DAY_US, 6 * 3600 * 1_000_000)
    batch = audit_frame(ev.select("bucket", "us")).collect()
    assert sum(r.n_late for r in batch) > 0, (
        "degenerate fixture: the jitter model must produce some "
        "late rows or the parity proves nothing"
    )

    landing = os.path.join(tdir, "landing")
    buckets = [r.bucket for r in batch]  # already bucket-ascending
    t0 = time.time() - 2 * len(buckets) - 10
    seen: set = set()
    for i, b in enumerate(buckets):
        (
            ev.where(F.col("bucket") == b)
            .select(
                "event_id", "ts", "user_id", "event_type", "value", "props"
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(landing)
        )
        # file-source batch order is (modificationTime, path): stamp
        # each shard with a strictly increasing mtime
        for root, _, files in os.walk(landing):
            for fn in files:
                p = os.path.join(root, fn)
                if p not in seen and fn.endswith(".parquet"):
                    os.utime(p, (t0 + 2 * i, t0 + 2 * i))
                    seen.add(p)

    out, ckpt = os.path.join(tdir, "audit"), os.path.join(tdir, "ck")
    run_late_audit_to_parquet(spark, landing, out, ckpt)
    stream = serve_late_audit(spark, out).collect()  # batch_id asc
    assert len(stream) == len(batch)
    for s, b in zip(stream, batch):
        prior = ABSENT if s.prior_hwm_us is None else s.prior_hwm_us
        assert (s.n_rows, s.min_us, s.max_us, prior, s.n_late) == (
            b.n_rows,
            b.min_us,
            b.max_us,
            b.prior_hwm_us,
            b.n_late,
        ), f"bucket {b.bucket} (batch {s.batch_id}) diverged"


def test_heavy_hitters_serve_matches_stream_no_eviction(spark, tdir):
    """With <= CAPACITY distinct items per shard the space-saving
    sketch is exact (no eviction ever fires), so the REAL stream's
    serve and the batch twin's exact-count serve must return the
    same top-k — sharding scheme (murmur hash vs mod) cannot matter
    when every item survives."""
    sf_twin = os.path.join(tdir, "sf")
    ev = load(spark, SF_DIR_SMOKE, "events").where(
        F.col("user_id") < topk.CAPACITY
    )
    ev.write.mode("overwrite").parquet(os.path.join(sf_twin, "events.parquet"))

    landing = os.path.join(tdir, "landing")
    ev.repartition(2).write.mode("overwrite").parquet(landing)
    name = f"hhserve_{uuid.uuid4().hex[:6]}"
    q = (
        topk.streaming_heavy_hitters(events_stream(spark, landing))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_stream = [
        (r.item, r.est, r.err)
        for r in topk.current_top_k(spark.sql(f"SELECT * FROM {name}")
                                    ).collect()
    ]
    got_batch = [
        (r.item, r.est, r.err)
        for r in heavy_hitters_serve(spark, sf_twin).collect()
    ]
    assert len(got_batch) > 0
    assert got_stream == got_batch
