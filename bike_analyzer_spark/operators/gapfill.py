"""Time-series gap filling — the TimescaleDB `time_bucket_gapfill`
shape that completes the hypertable family (`hypertable.py` is the
continuous-aggregate cascade; this is its read-side companion).

Reference scope: the reference's hourly profile (`sql/queries.sql`)
silently SKIPS empty hours — a dashboard plotting it draws lines
between non-adjacent buckets. The warehouse answer is a dense grid:
every hour between each series' first and last observation exists in
the output, zero-filled for counts, with two interpolation policies
for the value sum:

* **LOCF** (last observation carried forward) — the step-function
  read TimescaleDB calls `locf()`;
* **linear** — `interpolate()`: the straight line between the
  previous and next observed buckets, evaluated at the gap hour.

Exactness: hour sums are exact integer cents; the linear form
evaluates  (prev·(next_h−h) + next·(h−prev_h)) / (next_h−prev_h)
as a 128-bit half-up integer division at 10⁻⁴ units
(`functions.exact.halfup_div_wide_sql` — overflow-proof per the r7
ADVICE discipline), and every displayed double is ONE IEEE divide of
an integer by a power of ten, never a rounded double. Operands are
non-negative (events.value ≥ 0.01 by data contract).

Scale: the grid is TIME-bounded, not data-bounded — `sequence(min,
max, 1 hour)` per series explodes to (span-hours × n_types) rows
(720 × 5 here; a year of 10k series is ~88M rows — trivial next to
the 100 TB fact scan that feeds it). The only corpus-sized shuffle
is the hourly pre-aggregation; the grid join and both window passes
run on the aggregated frame, partitioned by series key. Anchors are
per-series min/max, so every gap row has both a previous and a next
observation by construction (no extrapolation case exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import cents, halfup_div_wide_sql
from ..sources.catalog import load

#: microseconds per hour — the integer hour index base
HOUR_US = 3_600_000_000


def hypertable_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly grid per event_type with zero-filled counts and
    LOCF + linearly-interpolated value sums."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("value"))).alias("c"),
        )
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    filled = grid.join(hourly, ["event_type", "bucket"], "left").withColumn(
        "h", F.expr(f"unix_micros(bucket) div {HOUR_US}")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    anchor_h = F.when(F.col("c").isNotNull(), F.col("h"))
    anchored = (
        filled.withColumn("locf_c", F.last("c", ignorenulls=True).over(wp))
        .withColumn("prev_h", F.last(anchor_h, ignorenulls=True).over(wp))
        .withColumn("next_c", F.first("c", ignorenulls=True).over(wn))
        .withColumn("next_h", F.first(anchor_h, ignorenulls=True).over(wn))
    )
    # gap rows: cents·100 = 10⁻⁴-unit integer, half-up at the divide
    interp_u4 = halfup_div_wide_sql(
        "(locf_c * (next_h - h) + next_c * (h - prev_h)) * 100",
        "next_h - prev_h",
    )
    return anchored.selectExpr(
        "event_type",
        "unix_micros(bucket) AS bucket_us",
        "c IS NOT NULL AS has_data",
        "CAST(COALESCE(n, 0) AS BIGINT) AS n_events",
        "locf_c / CAST(100 AS DOUBLE) AS locf_sum_v",
        f"""CASE WHEN c IS NOT NULL THEN c * 100
                 ELSE {interp_u4} END
            / CAST(10000 AS DOUBLE) AS interp_sum_v""",
    ).orderBy("event_type", "bucket_us")


QUERIES = {"hypertable_gapfill": hypertable_gapfill}

_INTERP_DUCK = halfup_div_wide_sql(
    "(locf_c * (next_h - h) + next_c * (h - prev_h)) * 100",
    "next_h - prev_h",
    engine="duck",
)

ORACLES = {
    "hypertable_gapfill": f"""
        WITH hourly AS (
            SELECT event_type,
                   date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
                   count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
            FROM hourly GROUP BY 1
        ),
        grid AS (
            SELECT event_type,
                   unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
                       AS bucket
            FROM bounds
        ),
        f AS (
            SELECT g.event_type, g.bucket, h.n, h.c,
                   epoch_us(g.bucket) // 3600000000 AS h
            FROM grid g
            LEFT JOIN hourly h
              ON g.event_type = h.event_type AND g.bucket = h.bucket
        ),
        a AS (
            SELECT *,
                   last_value(c IGNORE NULLS) OVER wp AS locf_c,
                   last_value(CASE WHEN c IS NOT NULL THEN h END
                              IGNORE NULLS) OVER wp AS prev_h,
                   first_value(c IGNORE NULLS) OVER wn AS next_c,
                   first_value(CASE WHEN c IS NOT NULL THEN h END
                               IGNORE NULLS) OVER wn AS next_h
            FROM f
            WINDOW wp AS (PARTITION BY event_type ORDER BY h
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW),
                   wn AS (PARTITION BY event_type ORDER BY h
                          ROWS BETWEEN CURRENT ROW
                          AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type,
               epoch_us(bucket) AS bucket_us,
               c IS NOT NULL AS has_data,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
               locf_c / CAST(100 AS DOUBLE) AS locf_sum_v,
               (CASE WHEN c IS NOT NULL THEN c * 100
                     ELSE {_INTERP_DUCK} END)
                   / CAST(10000 AS DOUBLE) AS interp_sum_v
        FROM a
        ORDER BY event_type, bucket_us
    """,
}
