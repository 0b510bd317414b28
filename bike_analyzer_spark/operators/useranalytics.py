"""User-level cohort analytics over the events stream.

The reference's per-user aggregates (`analysis.py`'s activity and
value summaries, re-expressed here as a8/a9) answer "what did each
user do"; the warehouse question behind them is "do users RETAIN" —
the weekly cohort triangle every product-analytics stack computes:
bucket each user by first-seen ISO week, then count how many of that
cohort are active k weeks later, as a percentage of cohort size.

Exactness: counts are exact integers; the retention percentage is
`functions.exact.halfup_ratio_sql` on (100·active, cohort_size) —
never a rounded double. Week arithmetic stays integral: both engines
truncate to Monday (`date_trunc('week')`) so day-differences are
exact multiples of 7.

Scale: two shuffles on `user_id` (first-seen min-agg; the
distinct-(user, week) activity set), then a join on `user_id` —
at 1000 executors the min-agg's hash partitioning is reusable by the
join side, and the cohort triangle itself is (weeks × weeks) rows:
bounded by the time span squared, independent of corpus size. The
final cohort-size window runs on that tiny triangle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import halfup_ratio_sql
from ..sources.catalog import load

#: displayed digits of the retention percentage
RETENTION_DIGITS = 2


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: (cohort_week, week_offset)
    → distinct active users, cohort size, half-up retention pct."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    per = (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("CAST(datediff(week, cohort_week) div 7 AS INT)").alias(
                "week_offset"
            ),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
    # offset 0 always exists (a user is active in their first week),
    # so cohort_size is never null
    size0 = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_users"))
    ).over(Window.partitionBy("cohort_week"))
    return (
        per.withColumn("cohort_size", size0)
        .selectExpr(
            "cohort_week",
            "week_offset",
            "n_users",
            "cohort_size",
            halfup_ratio_sql(
                "n_users * 100", "cohort_size", RETENTION_DIGITS
            )
            + " AS retention_pct",
        )
        .orderBy("cohort_week", "week_offset")
    )


QUERIES = {"cohort_retention": cohort_retention}

_PCT_DUCK = halfup_ratio_sql(
    "n_users * 100", "cohort_size", RETENTION_DIGITS, engine="duck"
)

ORACLES = {
    "cohort_retention": f"""
        WITH ev AS (
            SELECT user_id,
                   CAST(date_trunc('week', CAST(ts AS TIMESTAMP))
                        AS DATE) AS week
            FROM events
        ),
        first AS (
            SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1
        ),
        active AS (SELECT DISTINCT user_id, week FROM ev),
        per AS (
            SELECT cohort_week,
                   CAST(date_diff('day', cohort_week, week) // 7
                        AS INT) AS week_offset,
                   count(DISTINCT user_id) AS n_users
            FROM active JOIN first USING (user_id)
            GROUP BY 1, 2
        ),
        w AS (
            SELECT *,
                   max(CASE WHEN week_offset = 0 THEN n_users END)
                       OVER (PARTITION BY cohort_week) AS cohort_size
            FROM per
        )
        SELECT cohort_week, week_offset, n_users, cohort_size,
               {_PCT_DUCK} AS retention_pct
        FROM w
        ORDER BY cohort_week, week_offset
    """,
}
