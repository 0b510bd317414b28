"""Gaps-and-islands + range (interval) join — the second time-series
operator family the builder brief names as missing from Spark ("e.g.,
as-of join, range join"), built as compositions of native ops like
`asof.py`.

busy_islands: maximal runs of consecutive busy hours (hours with
>= BUSY_MIN_VIEWS view events), via the classic gaps-and-islands
row_number-difference trick. The window is GLOBAL but its input is
post-aggregation calendar-hour grain — cardinality is bounded by the
time span (10 years ≈ 88k rows), NOT by data volume, so the
single-partition window is safe at any corpus size (unlike w3's
rejected per-event global window; see windows.py:110).

range_join_busy: purchases joined to the island that CONTAINS their
timestamp. The naive plan for `p.ts BETWEEN i.start AND i.end` is a
BroadcastNestedLoopJoin — O(|purchases| x |islands|) comparisons. The
scale path BUCKETIZES: each island explodes into its hour-grain
buckets, each purchase computes its hour bucket, and the join becomes
an EQUI join on bucket (hash join, shuffle bounded by data size) with
a residual containment filter for non-grain-aligned interval edges.
Plan-asserted: no nested-loop join, no cartesian product.

At 100 TB: islands are aggregates (tiny, broadcastable); the bucket
explode multiplies intervals by their hour count (bounded); the fact
side computes one bucket per row — a narrow projection. The hash join
on bucket is the only wide operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load

BUSY_MIN_VIEWS = 3
HOUR_US = 3_600_000_000


def _hourly_busy(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") == "view")
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("n_views"))
        .filter(F.col("n_views") >= BUSY_MIN_VIEWS)
    )


def _islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly_busy(spark, sf_dir)
    w = Window.orderBy("hr")  # bounded post-agg domain; see module doc
    # integer `div`, not float division + cast: exact at any epoch
    # magnitude and floor-consistent for pre-1970 timestamps
    grp = F.expr(f"unix_micros(hr) div {HOUR_US}") - F.row_number().over(w)
    return (
        hourly.withColumn("grp", grp)
        .groupBy("grp")
        .agg(
            F.unix_micros(F.min("hr")).alias("start_us"),
            (F.unix_micros(F.max("hr")) + F.lit(HOUR_US)).alias("end_us"),
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("n_views").alias("n_views"),
        )
        .drop("grp")
    )


def busy_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal consecutive-busy-hour intervals [start_us, end_us)."""
    return _islands(spark, sf_dir).select(
        "start_us", "end_us", "n_hours", "n_views"
    ).orderBy("start_us")


def range_join_busy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined to its containing busy island — the
    bucketized range join (equi join on hour bucket + residual
    containment filter), never a nested-loop scan."""
    islands = _islands(spark, sf_dir)
    buckets = islands.select(
        "start_us",
        "end_us",
        F.explode(
            F.sequence(
                F.col("start_us"),
                F.col("end_us") - F.lit(HOUR_US),
                F.lit(HOUR_US),
            )
        ).alias("bucket_us"),
    )
    purchases = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            # exact temporal truncation — the same derivation island
            # buckets use, so the equi-join key matches bit-for-bit
            # (float division + cast truncates toward zero: wrong
            # bucket pre-1970, rounding-fragile at hour boundaries)
            F.unix_micros(F.date_trunc("hour", "ts")).alias("bucket_us"),
        )
    )
    return (
        purchases.join(buckets, "bucket_us")
        # redundant for hour-aligned islands; kept because the pattern
        # must stay correct for arbitrary interval edges
        .filter(
            (F.col("ts_us") >= F.col("start_us"))
            & (F.col("ts_us") < F.col("end_us"))
        )
        .select("event_id", "ts_us", F.col("start_us").alias("island_start_us"))
        .orderBy("event_id")
    )


QUERIES = {
    "busy_islands": busy_islands,
    "range_join_busy": range_join_busy,
}

_ISLANDS_SQL = f"""
        hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
                   count(*) AS n_views
            FROM events
            WHERE event_type = 'view'
            GROUP BY 1
            HAVING count(*) >= {BUSY_MIN_VIEWS}
        ),
        grouped AS (
            SELECT hr, n_views,
                   epoch_us(hr) // {HOUR_US}
                       - row_number() OVER (ORDER BY hr) AS grp
            FROM hourly
        ),
        islands AS (
            SELECT epoch_us(min(hr)) AS start_us,
                   epoch_us(max(hr)) + {HOUR_US} AS end_us,
                   count(*) AS n_hours,
                   CAST(sum(n_views) AS BIGINT) AS n_views
            FROM grouped
            GROUP BY grp
        )
"""

ORACLES = {
    "busy_islands": f"""
        WITH {_ISLANDS_SQL}
        SELECT start_us, end_us, n_hours, n_views
        FROM islands
        ORDER BY start_us
    """,
    # the oracle uses the NAIVE inequality join — an independent plan
    # for the same semantics the bucketized form must reproduce
    "range_join_busy": f"""
        WITH {_ISLANDS_SQL}
        SELECT p.event_id,
               epoch_us(CAST(p.ts AS TIMESTAMP)) AS ts_us,
               i.start_us AS island_start_us
        FROM events p
        JOIN islands i
          ON epoch_us(CAST(p.ts AS TIMESTAMP)) >= i.start_us
         AND epoch_us(CAST(p.ts AS TIMESTAMP)) < i.end_us
        WHERE p.event_type = 'purchase'
        ORDER BY event_id
    """,
}
