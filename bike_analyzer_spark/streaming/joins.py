"""Stream-STREAM event-time interval join (SURVEY.md §2.9) — the one
Structured Streaming join shape the rest of the streaming pack didn't
cover: two unbounded sides buffered against each other under
watermarks, with an event-time range condition bounding how long
either side's state lives.

The concrete operator is a conversion funnel over the events corpus:
every `view` joined to the same user's `purchase`s that happen within
CONVERSION_HORIZON_MIN minutes — the streaming analog of a batch
interval self-join (same `conversion_join` code runs on batch frames,
which is how the parity test pins it).

State story at 100 TB/day: both sides are watermarked, and the join
condition couples the two event times (p_ts between v_ts and v_ts +
horizon), so Spark's StreamingSymmetricHashJoin can evict a buffered
view once the watermark passes v_ts + horizon and a buffered purchase
once it passes p_ts — state is bounded by (traffic within horizon +
allowed lateness), never by stream length. Without the range
condition the view side would buffer FOREVER (documented Spark
behavior for unbounded stream-stream joins); the explicit coupling is
the whole design.

Keys: the join shuffles both sides on user_id — at scale this is the
same hash exchange a batch join pays, amortized per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA

#: purchases count as conversions this many minutes after the view
CONVERSION_HORIZON_MIN = 30
#: how late either side's events may arrive before state eviction
LATE_LIMIT = "1 hour"


def events_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over landed event shards, schema pinned
    (streaming sources never infer); one file per micro-batch so
    replays exercise CROSS-batch join buffering, not a single-batch
    degenerate case."""
    return (
        spark.readStream.schema(TESTDATA["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )


def conversion_join(
    events: DataFrame, horizon_min: int = CONVERSION_HORIZON_MIN
) -> DataFrame:
    """view→purchase conversions within `horizon_min` minutes, per
    user. Works identically on a batch frame and a streaming frame —
    withWatermark is a no-op on batch — so batch IS the oracle for
    the streaming run (tests/test_stream_join.py).

    Returns (user_id, view_id, purchase_id, view_ts, purchase_ts,
    secs_to_convert)."""
    views = (
        events.filter(F.col("event_type") == "view")
        .withWatermark("ts", LATE_LIMIT)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", LATE_LIMIT)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {horizon_min} MINUTES")
        )
    )
    return (
        views.join(purchases, cond, "inner")
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            "view_ts",
            "purchase_ts",
            (
                F.unix_micros("purchase_ts") - F.unix_micros("view_ts")
            ).alias("us_to_convert"),
        )
    )


def conversion_join_outer(
    events: DataFrame, horizon_min: int = CONVERSION_HORIZON_MIN
) -> DataFrame:
    """LEFT-OUTER variant of the conversion funnel — the shape real
    funnels need: every view emits, converted or not. Matches emit as
    soon as both sides meet (same as the inner join); an UNMATCHED
    view's null-right row emits only once the watermark passes
    view_ts + horizon — the point where Spark can PROVE no purchase
    can ever arrive for it (outer results cannot be early: emitting a
    null row and later a match would retract appended output). Same
    bounded-state story as the inner join: the event-time range
    condition couples the two sides, so buffered rows evict with the
    watermark; the null emission rides the same eviction.

    `converted` is derived, not inferred downstream, so consumers
    never need a null-sentinel convention. Works identically on a
    batch frame (a plain left join — the parity oracle), where every
    unmatched view appears because batch has no open horizon."""
    views = (
        events.filter(F.col("event_type") == "view")
        .withWatermark("ts", LATE_LIMIT)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", LATE_LIMIT)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {horizon_min} MINUTES")
        )
    )
    return (
        views.join(purchases, cond, "left_outer")
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            "view_ts",
            "purchase_ts",
            (
                F.unix_micros("purchase_ts") - F.unix_micros("view_ts")
            ).alias("us_to_convert"),
            F.col("purchase_id").isNotNull().alias("converted"),
        )
    )


def run_outer_conversions_to_memory(
    spark: SparkSession, landing_dir: str, name: str
):
    """Drain the landed shards through the OUTER join (availableNow;
    append mode — matches emit per micro-batch, null-right rows emit
    at watermark eviction). Returns the finished query handle so
    tests can read the final watermark from its progress."""
    q = (
        conversion_join_outer(events_stream(spark, landing_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def enriched_nation_counts(
    spark: SparkSession, events: DataFrame, sf_dir: str
) -> DataFrame:
    """STREAM-STATIC dimension enrichment — the other streaming join
    kind: the unbounded event stream joins the static customer->nation
    dimensions with NO state at all (Spark re-evaluates the static
    side per micro-batch; a dim update is picked up on the next
    trigger), then aggregates hourly signup counts per nation under a
    watermark. Works identically on a batch frame — the parity
    oracle."""
    from ..sources.catalog import load

    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    nation = F.broadcast(
        load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        events.withWatermark("ts", LATE_LIMIT)
        .filter(F.col("event_type") == "signup")
        .join(cust, "user_id")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("n_name"))
        .agg(F.count(F.lit(1)).alias("n_signups"))
        .select(
            F.col("w.start").alias("hour_start"), "n_name", "n_signups"
        )
    )


def run_conversions_to_memory(
    spark: SparkSession, landing_dir: str, name: str
) -> None:
    """Drain the landed event shards through the stream-stream join
    into an in-memory table (availableNow; append mode — inner
    stream-stream joins emit each match exactly once)."""
    q = (
        conversion_join(events_stream(spark, landing_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
