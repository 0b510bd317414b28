"""As-of join and gap sessionization — time-series operators Spark
lacks natively, built as compositions of existing DataFrame ops
(builder brief: "custom operators ... as (a) a composition of existing
DataFrame ops if semantics allow").

as-of join (backward): for each left row, the most recent right row
with right.ts <= left.ts (optionally per key). Implemented with the
union-marker technique — no range/cross join:

    union(left-marked, right-marked)
      sort by (ts, marker)            right sorts BEFORE left on ties
      last_value(right cols, ignorenulls=True)
        over (orderBy (ts, marker) rowsBetween unboundedPreceding, current)
      keep left rows

One shuffle (the window sort), linear in |left|+|right| — at 100 TB
this beats any join that enumerates candidate pairs. With a `by` key
the window partitions on it, so state never concentrates.

The DuckDB oracle uses its NATIVE `ASOF JOIN` — a genuinely
independent implementation of the same semantics.

Sessionization: classic gap-based session ids — a new session starts
when the gap to the previous event of the same key exceeds the
threshold; session_id = running count of session-starts. Two stacked
windows over ONE (user, ts) partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    value_cols: list[str],
    by: list[str] | None = None,
) -> DataFrame:
    """Attach the latest `value_cols` from `right` at or before each
    left row's ts. Left rows before any right row get NULLs.

    Requires `by` keys: without them the window would be a single
    global partition (every row in one task — the plan shape this
    repo rejects everywhere else). For an un-keyed as-of against a
    SMALL right side use `asof_join_small_right`, which stays fully
    parallel."""
    if not by:
        raise ValueError(
            "asof_join_backward needs partition keys (`by`); for an "
            "un-keyed as-of against a small right side use "
            "asof_join_small_right"
        )
    lmark = left.select(
        *by,
        F.col(ts_col),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        *[F.col(c) for c in left.columns if c not in by and c != ts_col],
    )
    rmark = right.select(
        *by,
        F.col(ts_col),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by and c != ts_col
        ],
    )
    u = lmark.unionByName(rmark)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    keep = [c for c in left.columns]
    return (
        filled.filter(F.col("_is_left") == 1)
        .select(
            *keep,
            *[F.col(f"_f_{c}").alias(c) for c in value_cols],
        )
    )


def asof_join_small_right(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Un-keyed backward as-of for a SMALL right side (e.g. an hourly
    series): the right table collapses to one sorted struct array,
    broadcast to every task; each left row picks the last element with
    ts <= its own via a codegen'd array filter. Fully parallel — no
    global sort, no shuffle of the left side at all. Cost is O(|right|)
    per left row; use the keyed union-window form when the right side
    is large."""
    arr = right.agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col(ts_col).alias("_ts"), *value_cols)
            )
        ).alias("_arr")
    )
    joined = left.crossJoin(F.broadcast(arr))
    # try_element_at: a left row earlier than every right row filters
    # to an empty array, where ANSI element_at would throw
    best = F.try_element_at(
        F.filter(F.col("_arr"), lambda x: x["_ts"] <= F.col(ts_col)), F.lit(-1)
    )
    return joined.select(
        *left.columns, *[best[c].alias(c) for c in value_cols]
    )


def asof_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo/correctness query: each purchase event gets the most
    recent COMPLETED-hour view-count at or before its timestamp (the
    weather-asof pattern with an event-derived hourly right side)."""
    # spread read: the hourly series is integer counts and the probe
    # outputs are per-row — no float accumulation-order sensitivity —
    # and the O(|hours|)-per-row array probe parallelizes across cores
    # with no per-query shuffle
    from ..sources.catalog import load_events_spread

    events = load_events_spread(spark, sf_dir)
    hourly = (
        events.filter(F.col("event_type") == "view")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("views_in_hour"))
        # the hour's stats are known at its END -> shift the as-of key
        .select(
            (F.col("h") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
            "views_in_hour",
        )
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("value")
    )
    out = asof_join_small_right(purchases, hourly, "ts", ["views_in_hour"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        "views_in_hour",
    ).orderBy("event_id")


SESSION_GAP_MIN = 30


def sessionize(
    events: DataFrame, key: str, ts_col: str, gap_minutes: int
) -> DataFrame:
    """Gap-based session ids per key; one shuffle on the key."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col("event_id"))
    # microsecond precision on BOTH engines: unix_timestamp() truncates
    # to seconds while DuckDB epoch() keeps fractions — gaps straddling
    # the threshold would disagree
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_us)
    ).cast("int")
    return events.withColumn("_new", new_session).withColumn(
        "session_id", F.sum("_new").over(w).cast("bigint")
    ).drop("_new")


def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session aggregates: length, span, value — the
    training-pipeline sessionization primitive."""
    events = load(spark, sf_dir, "events")
    s = sessionize(events, "user_id", "ts", SESSION_GAP_MIN)
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts")).alias("start_us"),
            F.unix_micros(F.max("ts")).alias("end_us"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


def session_window_agg(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MIN
) -> DataFrame:
    """The session_window aggregation itself, batch/stream agnostic:
    works on any frame with (user_id, ts, value). The streaming layer
    (`streaming.sessions`) runs this exact function over the
    file-replay source — batch/stream parity is by construction, not
    by re-implementation."""
    return (
        events.groupBy(
            "user_id",
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            "n_events",
            "sum_value",
        )
    )


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window (gap-merged event-time windows)
    — same semantics as `sessionize`, different machinery (one
    groupBy aggregation, streaming-capable). The oracle derives the
    identical windows from the window-function sessionization, so the
    two implementations cross-validate."""
    events = load(spark, sf_dir, "events")
    return session_window_agg(events).orderBy("user_id", "start_us")


QUERIES = {
    "asof_hourly_stats": asof_hourly_stats,
    "session_stats": session_stats,
    "session_window_stats": session_window_stats,
}

ORACLES = {
    # independent implementation: DuckDB's NATIVE ASOF JOIN
    "asof_hourly_stats": """
        WITH hourly AS (
            SELECT date_trunc('hour', ts) + INTERVAL 1 HOUR AS ts,
                   count(*) AS views_in_hour
            FROM events WHERE event_type = 'view'
            GROUP BY 1
        ),
        p AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                   round(value, 4) AS value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id,
               epoch_us(p.ts) AS ts_us, p.value,
               hourly.views_in_hour
        FROM p ASOF LEFT JOIN hourly ON p.ts >= hourly.ts
        ORDER BY event_id
    """,
    "session_window_stats": """
        WITH g AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(CAST(ts AS TIMESTAMP))
                            - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                            > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS session_id
            FROM g
        )
        SELECT user_id,
               epoch_us(CAST(min(ts) AS TIMESTAMP)) AS start_us,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM s GROUP BY user_id, session_id
        ORDER BY user_id, start_us
    """,
    "session_stats": """
        WITH g AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(CAST(ts AS TIMESTAMP))
                            - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                            > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS BIGINT) AS session_id
            FROM g
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               epoch_us(CAST(min(ts) AS TIMESTAMP)) AS start_us,
               epoch_us(CAST(max(ts) AS TIMESTAMP)) AS end_us,
               round(sum(value), 4) AS sum_value
        FROM s GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
}
