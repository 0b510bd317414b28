"""Batch twins for the two remaining pytest-only streaming serves
(r10 verdict ask #7): the delivery-lag audit (`streaming/lateaudit.py`)
and the space-saving top-k serve (`streaming/topk.py`). Twin = the
same serve-side computation the stream runs, re-expressed over a
deterministic batch partitioning of the events table, so the logic
earns DuckDB-oracle evidence through the driver gate instead of
pytest-only coverage.

What each twin gates (and what stays pytest):

- `delivery_lag_audit` — the audit SEMANTICS: per-batch row count,
  event-time min/max, prior high-water mark, and the count of rows
  older than (prior mark − allowed delay). The streaming original's
  batch boundary is "one landed file"; the batch twin's is an
  ARRIVAL-hour bucket under a modeled delivery skew (the testdata's
  events are perfectly time-ordered — disorder 0 — so without a
  skew model every n_late is trivially zero and the gate proves
  nothing). Skew model: arrival = event time + (event_id mod 7) x
  15 min, a deterministic jitter both engines express identically.
  The micro-batch plumbing (checkpoint replay, per-batch overwrite,
  first-batch-empty-history) remains pytest-gated in
  tests/test_lateaudit.py; tests/test_streamserve.py pins that this
  twin and the REAL streaming audit produce identical rows when the
  same buckets are landed as ordered files.

- `heavy_hitters_serve` — the serve path `current_top_k` (latest
  revision per shard -> global (est desc, item) top-k) applied to a
  two-revision summary history built in batch: revision 1 counts a
  deterministic subset (even event_ids, a stale snapshot), revision
  2 counts everything. The serve must pick revision 2 per shard —
  the oracle computes revision 2 directly, so a latest-revision bug
  on the Spark side hash-mismatches. The space-saving EVICTION
  logic is order-dependent per-row state (not SQL-expressible
  without row-by-row recursion) and stays pytest-gated
  (tests/test_streaming_topk.py pins the classic bounds); the batch
  summaries here are the sketch's exact no-eviction limit (err 0).

Scale shape:
- the audit's bucket frame is one row per arrival hour — calendar-
  bounded (~9k rows/year), so the cummax-over-buckets window is a
  bounded global window (allowlisted in tests/test_plan_audit.py)
  and joins back onto events as a broadcast; the two event scans
  (bucket stats, late counts) each partial-aggregate map-side.
- the serve twin's per-shard top-CAPACITY is the salted two-stage
  rank (the rrf_fusion/od_kcore discipline): stage 1 ranks within
  item-salted partitions (a row in a shard's true top-C ranks <= C
  within its salt), stage 2 ranks <= SALTS x CAPACITY survivors per
  shard — never a window over a whole shard's distinct items.

Reference parity: none (the reference has no streaming); part of
the beyond-reference streaming pack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import floordiv_duck, floordiv_sql
from ..sources.catalog import load
from ..streaming.lateaudit import LATE_DELAY_US
from ..streaming.topk import CAPACITY, HASH_SHARDS, current_top_k

QUERIES = {}
ORACLES = {}

#: modeled delivery skew: arrival = event time + (event_id mod
#: JITTER_MOD) * JITTER_STEP_US. Max jitter 6 x 15 min = 90 min >
#: the 30-min allowance, so late rows genuinely occur.
JITTER_MOD = 7
JITTER_STEP_US = 15 * 60 * 1_000_000

#: arrival bucket width (the batch twin's "micro-batch")
BUCKET_US = 3600 * 1_000_000

#: floor-division arrival bucket for the DuckDB oracle (twin of the
#: Spark side's floordiv_sql; see functions/exact.py)
_BUCKET_FLOOR = floordiv_duck(
    f"epoch_us(ts) + (event_id % {JITTER_MOD}) * {JITTER_STEP_US}",
    BUCKET_US,
)

#: sentinel for the first bucket's absent prior mark (NULL-free
#: output contract; epoch micros are non-negative)
ABSENT = -1

#: stage-1 salt fan-out for the per-shard top-CAPACITY rank
_HH_SALTS = 16


def audit_frame(ev: DataFrame, delay_us: int = LATE_DELAY_US) -> DataFrame:
    """The delivery-lag audit over a pre-bucketed event frame —
    the exact per-batch law `streaming/lateaudit.py` lands row by
    row: for each bucket (ascending), the prior high-water mark is
    the max event time over ALL earlier buckets, and a row is late
    iff its event time < prior mark − delay. `ev` needs columns
    (bucket bigint, us bigint); the first bucket's mark is the -1
    sentinel and nothing can be late against an empty history.
    """
    stats = ev.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("us").alias("min_us"),
        F.max("us").alias("max_us"),
    )
    # cummax over the bucket frame: bounded global window (one row
    # per bucket — calendar-sized), allowlisted by the plan audit
    w = (
        Window.partitionBy()
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = stats.withColumn("prior_hwm_us", F.max("max_us").over(w))
    late = (
        ev.join(
            F.broadcast(marked.select("bucket", "prior_hwm_us")), "bucket"
        )
        .where(F.col("us") < F.col("prior_hwm_us") - F.lit(delay_us))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )
    return (
        marked.join(late, "bucket", "left")
        .select(
            "bucket",
            "n_rows",
            "min_us",
            "max_us",
            F.coalesce("prior_hwm_us", F.lit(ABSENT)).alias("prior_hwm_us"),
            F.coalesce("n_late", F.lit(0)).alias("n_late"),
        )
        .orderBy("bucket")
    )


def delivery_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the delivery-lag audit per arrival-hour bucket
    under the deterministic jitter skew model."""
    ev = load(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts)").alias("us"),
        F.expr(
            floordiv_sql(
                f"unix_micros(ts) + (event_id % {JITTER_MOD})"
                f" * {JITTER_STEP_US}",
                BUCKET_US,
            )
        ).alias("bucket"),
    )
    return audit_frame(ev)


QUERIES["delivery_lag_audit"] = delivery_lag_audit

ORACLES["delivery_lag_audit"] = f"""
    WITH ev AS (
        SELECT epoch_us(ts) AS us,
               {_BUCKET_FLOOR} AS bucket
        FROM events
    ),
    stats AS (
        SELECT bucket, count(*) AS n_rows,
               min(us) AS min_us, max(us) AS max_us
        FROM ev GROUP BY bucket
    ),
    marked AS (
        SELECT *, max(max_us) OVER (
                   ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prior
        FROM stats
    ),
    late AS (
        SELECT ev.bucket AS bucket, count(*) AS n_late
        FROM ev JOIN marked USING (bucket)
        WHERE ev.us < marked.prior - {LATE_DELAY_US}
        GROUP BY ev.bucket
    )
    SELECT marked.bucket AS bucket, n_rows, min_us, max_us,
           COALESCE(prior, {ABSENT}) AS prior_hwm_us,
           COALESCE(n_late, 0) AS n_late
    FROM marked LEFT JOIN late USING (bucket)
    ORDER BY bucket
"""


def shard_summaries(ev: DataFrame, revision: int) -> DataFrame:
    """Exact capacity-bounded shard summaries — the space-saving
    sketch's no-eviction limit: per shard (item mod HASH_SHARDS; the
    stream's murmur-hash sharding satisfies the same per-item
    co-location contract, but mod is engine-portable), the top
    CAPACITY items by (count desc, item asc) with est = true count
    and err = 0. Salted two-stage rank; `ev` needs column (item).
    """
    counts = ev.groupBy(
        F.expr(f"pmod(item, {HASH_SHARDS})").alias("shard"), "item"
    ).agg(F.count(F.lit(1)).alias("est"))
    order = [F.desc("est"), F.asc("item")]
    # stage 1: item-salted partitions (each salt maps into exactly
    # one shard since HASH_SHARDS divides _HH_SALTS * HASH_SHARDS)
    w1 = Window.partitionBy("_salt").orderBy(*order)
    survivors = (
        counts.withColumn(
            "_salt",
            F.expr(f"pmod(item, {_HH_SALTS * HASH_SHARDS})").cast("int"),
        )
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= CAPACITY)
        .drop("_salt", "_rn")
    )
    # stage 2: exact per-shard rank over <= SALTS*CAPACITY survivors
    w2 = Window.partitionBy("shard").orderBy(*order)
    return (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= CAPACITY)
        .select(
            "shard",
            F.lit(revision).cast("long").alias("revision"),
            "item",
            "est",
            F.lit(0).cast("long").alias("err"),
        )
    )


def heavy_hitters_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: `current_top_k` — the stream's read side — over
    a two-revision summary history; the serve must surface revision
    2 (full counts) per shard, never the stale revision-1 snapshot
    (even event_ids only)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("item")
    )
    stale = shard_summaries(ev.where(F.expr("event_id % 2 = 0")), revision=1)
    live = shard_summaries(ev, revision=2)
    return current_top_k(stale.unionByName(live), k=10)


QUERIES["heavy_hitters_serve"] = heavy_hitters_serve

ORACLES["heavy_hitters_serve"] = f"""
    WITH counts AS (
        SELECT user_id % {HASH_SHARDS} AS shard, user_id AS item,
               count(*) AS est
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT shard, item, est,
               row_number() OVER (
                   PARTITION BY shard ORDER BY est DESC, item
               ) AS rn
        FROM counts
    )
    SELECT item, est, CAST(0 AS BIGINT) AS err
    FROM ranked WHERE rn <= {CAPACITY}
    ORDER BY est DESC, item LIMIT 10
"""


def rollup_partials_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the continuous-aggregate SERVE path's
    partial-merge law, run through the REAL streaming code — events
    split into three disjoint shards (pmod(event_id, 3), standing in
    for three micro-batches), each reduced by the write side's
    `batch_hour_partials`, the union re-aggregated and displayed by
    the read side's `merge_partials` (the exact function
    `serve_rollup` calls on the partials store). The oracle computes
    the hour rollup DIRECTLY from raw events, so a lossy merge, a
    dropped shard, or a display-expression drift between the serve
    and `hypertable_rollup`'s grain all hash-mismatch.

    Scale shape: three filtered map-side-combinable hour aggregates
    + one (hours x types x shards)-sized merge — partials, never
    events, cross the second exchange; identical to the production
    store whose size tracks (hours x types x batches)."""
    from ..streaming.rollupserve import batch_hour_partials, merge_partials

    ev = load(spark, sf_dir, "events")
    shards = [
        batch_hour_partials(ev.where(F.expr(f"pmod(event_id, 3) = {i}")))
        for i in range(3)
    ]
    parts = shards[0].unionByName(shards[1]).unionByName(shards[2])
    return merge_partials(parts)


QUERIES["rollup_partials_merge"] = rollup_partials_merge

# the same exact-cents + half-up display discipline as
# hypertable_rollup's hour grain (operators/hypertable.py)
from ..functions.exact import halfup_avg_sql as _havg  # noqa: E402

ORACLES["rollup_partials_merge"] = f"""
    SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))
               AS bucket_us,
           event_type,
           count(*) AS n,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 4) AS sum_v,
           {_havg("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)", "count(*)", engine="duck")} AS avg_v,
           round(min(value), 4) AS min_v,
           round(max(value), 4) AS max_v
    FROM events
    GROUP BY 1, 2
    ORDER BY bucket_us, event_type
"""
