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


#: touch channels eligible for attribution, and the lookback window
ATTR_CHANNELS = ("view", "click")
ATTR_WINDOW_HOURS = 24

_HOUR_US = 3_600_000_000


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every `purchase` is
    credited to the user's most recent `view`/`click` within the
    preceding ATTR_WINDOW_HOURS (channel `(none)` otherwise), and
    revenue rolls up per channel with a half-up share of total.

    The mechanism is a conditional LOCF over each user's (ts,
    event_id)-ordered sequence: `last(<touch expr>, ignorenulls)
    OVER (... ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)` carries the
    latest qualifying touch forward. Touch timestamp and channel
    ride two parallel IGNORE-NULLS windows gated by the IDENTICAL
    condition, so both resolve to the same row by construction (no
    struct needed — keeps the oracle twin engine-portable). The
    recency cut compares integer microsecond timestamps, so both
    engines apply the same exact 24h boundary (closed: a touch
    exactly 24h old still qualifies — the condition is >=,
    identically on both sides).

    Exactness: revenue sums are integer cents; the share is
    `halfup_ratio_sql` on (10000 * channel_cents, total_cents).

    Scale shape: ONE shuffle on user_id for the sequence window,
    then a |channels|-row aggregate; the total-revenue join is a
    1-row broadcast. Reference analog: none (the reference has no
    notion of attribution) — extends the events family a8/a9 and
    funnel_reconciliation opened.
    """
    from pyspark.sql import Window as W

    from ..functions.exact import cents

    in_touch = F.col("event_type").isin(*ATTR_CHANNELS)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        F.expr("unix_micros(ts)").alias("us"),
        cents(F.col("value")).alias("v"),
    )
    seq = ev.select(
        "event_type",
        "us",
        "v",
        F.last(F.when(in_touch, F.col("us")), ignorenulls=True)
        .over(w)
        .alias("touch_us"),
        F.last(F.when(in_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    window_us = ATTR_WINDOW_HOURS * _HOUR_US
    attributed = seq.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_us") >= F.col("us") - F.lit(window_us),
            F.col("touch_type"),
        )
        .otherwise(F.lit("(none)"))
        .alias("channel"),
        "v",
    )
    per = attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("v").alias("rev_c"),
    )
    tot = per.agg(F.sum("rev_c").alias("tot_c"))
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "channel",
            "n_purchases",
            "CAST(rev_c AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue",
            halfup_ratio_sql("100 * rev_c", "tot_c", 4)
            + " AS revenue_share_pct",
        )
        .orderBy("channel")
    )


QUERIES["attribution_last_touch"] = attribution_last_touch

_SHARE_DUCK = halfup_ratio_sql("100 * rev_c", "tot_c", 4, engine="duck")

ORACLES["attribution_last_touch"] = f"""
    WITH ev AS (
        SELECT user_id, event_type, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    ),
    seq AS (
        SELECT event_type, us, v,
               last_value(CASE WHEN event_type IN
                       {ATTR_CHANNELS} THEN us END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS touch_us,
               last_value(CASE WHEN event_type IN
                       {ATTR_CHANNELS} THEN event_type END
                       IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS touch_type
        FROM ev
    ),
    attributed AS (
        SELECT CASE WHEN touch_us >= us - {ATTR_WINDOW_HOURS}
                        * {_HOUR_US}
                    THEN touch_type ELSE '(none)' END AS channel,
               v
        FROM seq WHERE event_type = 'purchase'
    ),
    per AS (
        SELECT channel, count(*) AS n_purchases,
               CAST(sum(v) AS BIGINT) AS rev_c
        FROM attributed GROUP BY channel
    ),
    tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot_c FROM per)
    SELECT channel, n_purchases,
           CAST(rev_c AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
           {_SHARE_DUCK} AS revenue_share_pct
    FROM per, tot
    ORDER BY channel
"""


#: decay time constant (days) and the quantization of the decay
#: factor (ppm — the exp() twin of the dsir/lm ln() discipline)
LTV_TAU_DAYS = 7
LTV_TOP = 20

_DAY_US = 86_400_000_000


def ltv_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-LTV_TOP users by exponentially-decayed lifetime value —
    the retention-weighted LTV every growth team ranks accounts by:
    an event worth v that happened dt ago contributes
    v * exp(-dt / tau), anchored at the corpus's max timestamp (a
    deterministic shared reference, not wall clock).

    Exactness: exp() is the ONE transcendental — quantized ONCE per
    event to integer ppm (`round(exp(-dt/tau) * 1e6)`; dt/tau is a
    ratio of exact integer microseconds, so both engines evaluate
    exp on the bit-identical double; the ~1e-9 .5-boundary class is
    the same accepted one as the ln() family). Contributions
    v_cents * decay_ppm are exact integers, the per-user sum is
    order-free, and the displayed LTV is ONE divide by 1e8.

    Scale shape: one corpus-sized shuffle on user_id; the anchor is
    a 1-row broadcast. Overflow: cents * ppm <= 1e6 * v_cents per
    event — a user needs ~10^12 event-cents to stress bigint; the
    sum itself is pinned by DuckDB erroring loudly (the canary).
    """
    from ..functions.exact import cents

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        cents(F.col("value")).alias("v"),
        F.expr("unix_micros(ts)").alias("us"),
    )
    anchor = ev.agg(F.max("us").alias("ref_us"))
    tau_us = LTV_TAU_DAYS * _DAY_US
    decay_ppm = (
        f"CAST(round(exp(-(CAST(ref_us - us AS DOUBLE)"
        f" / CAST({tau_us} AS DOUBLE))) * 1000000) AS BIGINT)"
    )
    return (
        ev.crossJoin(F.broadcast(anchor))
        .selectExpr(
            "user_id", "v", f"{decay_ppm} AS d"
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").alias("raw_c"),
            F.expr("sum(v * d)").alias("ltv_u"),
        )
        .selectExpr(
            "user_id",
            "n_events",
            "CAST(raw_c AS DOUBLE) / CAST(100 AS DOUBLE) AS raw_value",
            "ltv_u",
            "CAST(ltv_u AS DOUBLE) / CAST(100000000 AS DOUBLE)"
            " AS decayed_value",
        )
        .orderBy(F.desc("ltv_u"), F.asc("user_id"))
        .limit(LTV_TOP)
    )


QUERIES["ltv_decay"] = ltv_decay

ORACLES["ltv_decay"] = f"""
    WITH ev AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS v,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ),
    anchor AS (SELECT max(us) AS ref_us FROM ev),
    scored AS (
        SELECT user_id, v,
               CAST(round(exp(-(CAST(ref_us - us AS DOUBLE)
                   / CAST({LTV_TAU_DAYS * _DAY_US} AS DOUBLE)))
                   * 1000000) AS BIGINT) AS d
        FROM ev, anchor
    )
    SELECT user_id,
           count(*) AS n_events,
           CAST(CAST(sum(v) AS BIGINT) AS DOUBLE)
               / CAST(100 AS DOUBLE) AS raw_value,
           CAST(sum(v * d) AS BIGINT) AS ltv_u,
           CAST(CAST(sum(v * d) AS BIGINT) AS DOUBLE)
               / CAST(100000000 AS DOUBLE) AS decayed_value
    FROM scored
    GROUP BY user_id
    ORDER BY ltv_u DESC, user_id ASC
    LIMIT {LTV_TOP}
"""


def attribution_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert per attributed channel: for every purchase
    credited by the last-touch rule, the delay between touch and
    purchase — count, exact mean (half-up seconds), min and max.
    The '(none)' bucket has no touch and is excluded by definition.

    Shares attribution_last_touch's sequence machinery verbatim (the
    same parallel IGNORE-NULLS windows), so the two reports cannot
    disagree on which touch was credited. Delays are exact integer
    microseconds; the mean is `halfup_ratio_wide_sql` (the summed
    microseconds clear bigint only at ~10^5 purchase-years, but the
    wide form costs nothing and removes the ceiling).
    """
    from pyspark.sql import Window as W

    from ..functions.exact import halfup_ratio_wide_sql

    in_touch = F.col("event_type").isin(*ATTR_CHANNELS)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        F.expr("unix_micros(ts)").alias("us"),
    )
    seq = ev.select(
        "event_type",
        "us",
        F.last(F.when(in_touch, F.col("us")), ignorenulls=True)
        .over(w)
        .alias("touch_us"),
        F.last(F.when(in_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    window_us = ATTR_WINDOW_HOURS * _HOUR_US
    return (
        seq.where(
            (F.col("event_type") == "purchase")
            & (F.col("touch_us") >= F.col("us") - F.lit(window_us))
        )
        .select(
            F.col("touch_type").alias("channel"),
            (F.col("us") - F.col("touch_us")).alias("delay_us"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("delay_us").alias("sum_us"),
            F.min("delay_us").alias("min_us"),
            F.max("delay_us").alias("max_us"),
        )
        .selectExpr(
            "channel",
            "n_conversions",
            halfup_ratio_wide_sql("sum_us", "n_conversions * 1000000", 2)
            + " AS mean_delay_s",
            "CAST(min_us AS DOUBLE)"
            " / CAST(1000000 AS DOUBLE) AS min_delay_s",
            "CAST(max_us AS DOUBLE)"
            " / CAST(1000000 AS DOUBLE) AS max_delay_s",
        )
        .orderBy("channel")
    )


QUERIES["attribution_delay"] = attribution_delay

from ..functions.exact import halfup_ratio_wide_sql as _hrw

_MEAN_DELAY_DUCK = _hrw("sum_us", "n_conversions * 1000000", 2, "duck")

ORACLES["attribution_delay"] = f"""
    WITH ev AS (
        SELECT user_id, event_type, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ),
    seq AS (
        SELECT event_type, us,
               last_value(CASE WHEN event_type IN
                       {ATTR_CHANNELS} THEN us END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS touch_us,
               last_value(CASE WHEN event_type IN
                       {ATTR_CHANNELS} THEN event_type END
                       IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS touch_type
        FROM ev
    ),
    agg AS (
        SELECT touch_type AS channel,
               count(*) AS n_conversions,
               CAST(sum(us - touch_us) AS BIGINT) AS sum_us,
               CAST(min(us - touch_us) AS BIGINT) AS min_us,
               CAST(max(us - touch_us) AS BIGINT) AS max_us
        FROM seq
        WHERE event_type = 'purchase'
          AND touch_us >= us - {ATTR_WINDOW_HOURS} * {_HOUR_US}
        GROUP BY touch_type
    )
    SELECT channel, n_conversions,
           {_MEAN_DELAY_DUCK} AS mean_delay_s,
           CAST(min_us AS DOUBLE) / CAST(1000000 AS DOUBLE)
               AS min_delay_s,
           CAST(max_us AS DOUBLE) / CAST(1000000 AS DOUBLE)
               AS max_delay_s
    FROM agg
    ORDER BY channel
"""


#: rolling active-user window (days): WAU = distinct users active in
#: the trailing 7 calendar days ending at each day
WAU_DAYS = 7


def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per calendar day: DAU, trailing-7-day WAU, and the DAU/WAU
    stickiness percentage — the top row of every product-analytics
    dashboard, absent from the reference (its KPIs are
    station-level, `streamlit_app.py:96`).

    Sliding COUNT DISTINCT without a sliding window: each distinct
    (user, active-day) row is exploded into the WAU_DAYS calendar
    days it keeps the user "weekly active" for, deduped, and
    counted — an exact bounded-fanout rewrite (x7 rows, map-side
    local) of the quadratic days-x-events range join, and the shape
    that survives 100 TB where a per-day `COUNT(DISTINCT) OVER
    (RANGE 6 PRECEDING)` cannot (Spark refuses distinct aggregates
    over windows; a self-join recomputes each user 7 times). A
    28-day MAU would multiply the explode to x28 — at that width a
    bitmap/HLL sketch per day is the right tool (see `scale.py`),
    so this report deliberately stops at WAU.

    The day spine is generated from the observed [min, max] day
    bounds (1-row broadcast, the activity_acf shape), so zero-DAU
    days inside the span still appear — with their genuine WAU from
    neighbours' activity — and phantom days past the span do not.

    Exactness: integer counts; stickiness rides halfup_ratio_sql;
    WAU >= DAU by construction (every same-day user is covered).
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    user_days = ev.distinct().localCheckpoint(eager=False)
    dau = user_days.groupBy("day").agg(
        F.count(F.lit(1)).alias("dau")
    )
    wau = (
        user_days.select(
            "user_id",
            F.explode(
                F.expr(f"sequence(day, date_add(day, {WAU_DAYS - 1}))")
            ).alias("day"),
        )
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    bounds = user_days.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = (
        spark.range(1)
        .crossJoin(F.broadcast(bounds))
        .select(F.explode(F.expr("sequence(d0, d1)")).alias("day"))
    )
    return (
        calendar.join(dau, "day", "left")
        .join(wau, "day", "left")
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).alias("dau"),
            F.coalesce("wau", F.lit(0)).alias("wau"),
        )
        .selectExpr(
            "day",
            "dau",
            "wau",
            "CASE WHEN wau > 0 THEN "
            + halfup_ratio_sql("100 * dau", "wau", 2, "spark")
            + " END AS stickiness_pct",
        )
        .orderBy("day")
    )


QUERIES["dau_wau_stickiness"] = dau_wau_stickiness

ORACLES["dau_wau_stickiness"] = f"""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events
    ),
    dau AS (
        SELECT day, count(*) AS dau FROM ud GROUP BY day
    ),
    wau AS (
        SELECT day, count(*) AS wau FROM (
            SELECT DISTINCT user_id,
                   CAST(unnest(generate_series(day,
                       day + INTERVAL {WAU_DAYS - 1} DAY,
                       INTERVAL 1 DAY)) AS DATE) AS day
            FROM ud
        ) GROUP BY day
    ),
    cal AS (
        SELECT CAST(unnest(generate_series(
                   (SELECT min(day) FROM ud),
                   (SELECT max(day) FROM ud),
                   INTERVAL 1 DAY)) AS DATE) AS day
    )
    SELECT cal.day AS day,
           CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
           CAST(coalesce(wau.wau, 0) AS BIGINT) AS wau,
           CASE WHEN coalesce(wau.wau, 0) > 0 THEN
               {halfup_ratio_sql('100 * coalesce(dau.dau, 0)',
                                 'wau.wau', 2, 'duck')}
           END AS stickiness_pct
    FROM cal
    LEFT JOIN dau ON dau.day = cal.day
    LEFT JOIN wau ON wau.day = cal.day
    ORDER BY day
"""


#: ordered funnel step sequence (strictly increasing timestamps)
FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered multi-step SAME-DAY funnel: a (user, day) attempt
    reaches step k when an event of that type occurs STRICTLY AFTER
    the attempt's earliest qualifying step-(k-1) event (the classic
    min-chained funnel — each step's anchor is the earliest one, so
    the result is deterministic and order-of-evaluation-free).
    Emits one row per step: attempts reaching it, half-up
    conversion vs the previous step and vs step 1.

    The (user, day) grain is the SCALE-INVARIANT choice: per-user
    event density grows with the corpus (an all-time per-user chain
    saturates to 100% everywhere — measured), while density per
    user-day is corpus-independent, so the funnel shows genuine
    dropout at every SF. Complements `funnel_reconciliation` (set
    overlap on user-days, no ordering) with the SEQUENCED
    definition product funnels mean.

    Scale shape: ONE shuffle on the (user_id, day) key; the four
    chained min-over-partition windows run in successive
    projections over the SAME unsorted hash partitioning (no ORDER
    BY -> no sort — each is a full-partition min, and Catalyst
    reuses the exchange), then a 1-row global conditional aggregate
    and a constant 4-row unpivot. Timestamps compare as exact
    integer microseconds.
    """
    w = Window.partitionBy("user_id", "day")
    df = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
    )
    prev = None
    for i, step in enumerate(FUNNEL_STEPS, start=1):
        cond = F.col("event_type") == step
        if prev is not None:
            cond = cond & (F.col("us") > F.col(prev))
        df = df.withColumn(f"s{i}", F.min(F.when(cond, F.col("us"))).over(w))
        prev = f"s{i}"
    users = df.groupBy("user_id", "day").agg(
        *[
            F.max(f"s{i}").alias(f"s{i}")
            for i in range(1, len(FUNNEL_STEPS) + 1)
        ]
    )
    counts = users.agg(
        *[
            F.count(f"s{i}").alias(f"n{i}")
            for i in range(1, len(FUNNEL_STEPS) + 1)
        ]
    )
    rows = ", ".join(
        f"struct({i} AS step_idx, '{s}' AS step, n{i} AS n_user_days,"
        f" n{i - 1 if i > 1 else i} AS n_prev, n1 AS n_first)"
        for i, s in enumerate(FUNNEL_STEPS, start=1)
    )
    pct_prev = halfup_ratio_sql(
        "100 * n_user_days", "n_prev", 2, "spark"
    )
    pct_first = halfup_ratio_sql(
        "100 * n_user_days", "n_first", 2, "spark"
    )
    return (
        counts.selectExpr(f"explode(array({rows})) AS r")
        .selectExpr(
            "r.step_idx AS step_idx",
            "r.step AS step",
            "r.n_user_days AS n_user_days",
            "r.n_prev AS n_prev",
            "r.n_first AS n_first",
        )
        .selectExpr(
            "step_idx",
            "step",
            "n_user_days",
            f"CASE WHEN n_prev > 0 THEN {pct_prev} END AS pct_of_prev",
            f"CASE WHEN n_first > 0 THEN {pct_first} END AS pct_of_first",
        )
        .orderBy("step_idx")
    )


QUERIES["ordered_funnel"] = ordered_funnel


def _ordered_funnel_oracle() -> str:
    sel, src = [], "ev"
    for i, step in enumerate(FUNNEL_STEPS, start=1):
        cond = f"event_type = '{step}'"
        if i > 1:
            cond += f" AND us > s{i - 1}"
        sel.append(
            f"c{i} AS (SELECT *, min(CASE WHEN {cond} THEN us END)"
            f" OVER (PARTITION BY user_id, day) AS s{i} FROM {src})"
        )
        src = f"c{i}"
    n = len(FUNNEL_STEPS)
    steps_rows = ", ".join(
        f"({i}, '{s}')" for i, s in enumerate(FUNNEL_STEPS, start=1)
    )
    ns = ", ".join(
        f"count(s{i}) AS n{i}" for i in range(1, n + 1)
    )
    pick_n = (
        "CASE "
        + " ".join(
            f"WHEN step_idx = {i} THEN n{i}" for i in range(1, n + 1)
        )
        + " END"
    )
    pick_prev = (
        "CASE "
        + " ".join(
            f"WHEN step_idx = {i} THEN n{max(i - 1, 1)}"
            for i in range(1, n + 1)
        )
        + " END"
    )
    pp = halfup_ratio_sql("100 * n_user_days", "n_prev", 2, "duck")
    pf = halfup_ratio_sql("100 * n_user_days", "n_first", 2, "duck")
    return f"""
        WITH ev AS (
            SELECT user_id, CAST(ts AS DATE) AS day, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ),
        {', '.join(sel)},
        u AS (
            SELECT user_id, day,
                   {', '.join(f'max(s{i}) AS s{i}' for i in range(1, n + 1))}
            FROM {src} GROUP BY user_id, day
        ),
        counts AS (SELECT {ns} FROM u),
        unp AS (
            SELECT s.step_idx, s.step,
                   {pick_n} AS n_user_days,
                   {pick_prev} AS n_prev,
                   n1 AS n_first
            FROM (VALUES {steps_rows}) s(step_idx, step), counts
        )
        SELECT step_idx, step, n_user_days,
               CASE WHEN n_prev > 0 THEN {pp} END AS pct_of_prev,
               CASE WHEN n_first > 0 THEN {pf} END AS pct_of_first
        FROM unp
        ORDER BY step_idx
    """


ORACLES["ordered_funnel"] = _ordered_funnel_oracle()


#: position-based (U-shaped) multi-touch credit, in basis points:
#: first and last touch take POS_EDGE_BP each, the middles split
#: POS_MID_BP with the integer remainder going to the EARLIEST
#: middles (deterministic); 1-touch paths take everything, 2-touch
#: paths split evenly
POS_EDGE_BP = 4000
POS_MID_BP = 2000


def attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) multi-touch attribution:
    every purchase's credit is split across ALL its view/click
    touches in the preceding ATTR_WINDOW_HOURS — 40% to the first,
    40% to the last, 20% shared by the middles — and rolls up per
    channel. Purchases with no touch keep full credit under
    `(none)`. Completes the attribution family (last-touch credit,
    time-to-convert delays) with the multi-touch member real
    marketing mixes compare against.

    Exactness: credit is integer BASIS POINTS that sum to exactly
    10000 per purchase by construction — the middle share splits by
    truncating division with the remainder handed to the earliest
    middles one basis point each (all operands non-negative, so
    Spark `div` and DuckDB `//` agree) — and credited revenue is the
    exact integer sum of cents x bp, displayed through the 128-bit
    half-up. A conservation pytest pins the per-purchase total.

    Scale shape: ONE user-keyed equi join (purchases x touches) with
    window-bounded fanout — touches per purchase are bounded by
    event density x window, which is corpus-INDEPENDENT here (users
    scale with the corpus, per-user density doesn't) — then two
    windows over the purchase key (rank, count) that reuse the
    join's shuffle, a channel-sized rollup, and a 1-row total
    broadcast.
    """
    from pyspark.sql import Window as W

    from ..functions.exact import cents, halfup_ratio_sql, halfup_ratio_wide_sql

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
        cents(F.col("value")).alias("v"),
    ).localCheckpoint(eager=False)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("pid"),
        F.col("us").alias("pus"),
        F.col("v").alias("pv"),
    )
    touches = ev.where(F.col("event_type").isin(*ATTR_CHANNELS)).select(
        F.col("user_id").alias("tu"),
        F.col("event_type").alias("channel"),
        F.col("event_id").alias("tid"),
        F.col("us").alias("tus"),
    )
    window_us = ATTR_WINDOW_HOURS * _HOUR_US
    joined = purchases.join(
        touches,
        (F.col("pu") == F.col("tu"))
        & (F.col("tus") < F.col("pus"))
        & (F.col("tus") >= F.col("pus") - F.lit(window_us)),
        "left",
    )
    wp = W.partitionBy("pid")
    ranked = joined.select(
        "pid",
        "pv",
        F.coalesce("channel", F.lit("(none)")).alias("channel"),
        F.row_number()
        .over(wp.orderBy(F.asc_nulls_first("tus"), F.asc_nulls_first("tid")))
        .alias("rn"),
        F.count("tid").over(wp).alias("n"),
    )
    credit = (
        "CASE WHEN n = 0 THEN 10000"
        " WHEN n = 1 THEN 10000"
        f" WHEN n = 2 THEN 5000"
        f" WHEN rn = 1 OR rn = n THEN {POS_EDGE_BP}"
        f" ELSE {POS_MID_BP} div (n - 2)"
        f" + CAST(rn - 1 <= {POS_MID_BP} % (n - 2) AS INT)"
        " END"
    )
    per = (
        ranked.selectExpr(
            "channel", "pid", "pv", f"CAST({credit} AS BIGINT) AS bp"
        )
        .groupBy("channel")
        .agg(
            F.count_distinct("pid").alias("n_purchases"),
            F.sum("bp").alias("sum_bp"),
            F.sum(F.expr("pv * bp")).alias("vbp"),
        )
    )
    tot = per.agg(F.sum("vbp").alias("tot_vbp"))
    rev = halfup_ratio_wide_sql("vbp", "1000000", 2, "spark")
    share = halfup_ratio_sql("100 * vbp", "tot_vbp", 4, "spark")
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "channel",
            "n_purchases",
            "sum_bp",
            f"{rev} AS credited_revenue",
            f"{share} AS revenue_share_pct",
        )
        .orderBy("channel")
    )


QUERIES["attribution_position"] = attribution_position


def _attribution_position_oracle() -> str:
    from ..functions.exact import halfup_ratio_sql, halfup_ratio_wide_sql

    credit = (
        "CASE WHEN n = 0 THEN 10000"
        " WHEN n = 1 THEN 10000"
        " WHEN n = 2 THEN 5000"
        f" WHEN rn = 1 OR rn = n THEN {POS_EDGE_BP}"
        f" ELSE {POS_MID_BP} // (n - 2)"
        f" + CAST(rn - 1 <= {POS_MID_BP} % (n - 2) AS INT)"
        " END"
    )
    rev = halfup_ratio_wide_sql("vbp", "1000000", 2, "duck")
    share = halfup_ratio_sql("100 * vbp", "tot_vbp", 4, "duck")
    return f"""
        WITH ev AS (
            SELECT user_id, event_type, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                   CAST(round(value * 100) AS BIGINT) AS v
            FROM events
        ),
        p AS (
            SELECT user_id AS pu, event_id AS pid, us AS pus, v AS pv
            FROM ev WHERE event_type = 'purchase'
        ),
        t AS (
            SELECT user_id AS tu, event_type AS channel,
                   event_id AS tid, us AS tus
            FROM ev WHERE event_type IN {ATTR_CHANNELS}
        ),
        ranked AS (
            SELECT pid, pv,
                   coalesce(channel, '(none)') AS channel,
                   row_number() OVER (
                       PARTITION BY pid
                       ORDER BY tus ASC NULLS FIRST,
                                tid ASC NULLS FIRST) AS rn,
                   count(tid) OVER (PARTITION BY pid) AS n
            FROM p LEFT JOIN t
              ON pu = tu AND tus < pus
             AND tus >= pus - {ATTR_WINDOW_HOURS} * {_HOUR_US}
        ),
        per AS (
            SELECT channel,
                   count(DISTINCT pid) AS n_purchases,
                   CAST(sum(CAST({credit} AS BIGINT)) AS BIGINT)
                       AS sum_bp,
                   CAST(sum(pv * CAST({credit} AS BIGINT)) AS BIGINT)
                       AS vbp
            FROM ranked GROUP BY channel
        ),
        tot AS (SELECT CAST(sum(vbp) AS BIGINT) AS tot_vbp FROM per)
        SELECT channel, n_purchases, sum_bp,
               {rev} AS credited_revenue,
               {share} AS revenue_share_pct
        FROM per CROSS JOIN tot
        ORDER BY channel
    """


ORACLES["attribution_position"] = _attribution_position_oracle()


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-revenue LTV curves per weekly signup cohort: for
    each (first-seen cohort week, week offset), the purchase
    revenue earned that week, the running cumulative, and the
    cumulative LTV per cohort user — the money-side twin of
    `cohort_retention` (same cohort definition, same two-shuffle
    shape), answering "how fast does a cohort pay back".

    Exactness: revenue is integer cents; the cumulative rides an
    exact integer window sum over the weeks x weeks triangle
    (bounded by the time span squared, never corpus size); LTV per
    user is the half-up of (cum cents, 100 x cohort size).

    Scale shape: first-seen min-agg on user_id, purchase rollup
    joined on user_id (reusing the same hash partitioning), then
    all windows run on the bounded triangle.
    """
    from ..functions.exact import cents

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.to_date(F.date_trunc("week", "ts")).alias("week"),
        cents(F.col("value")).alias("v"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("CAST(datediff(week, cohort_week) div 7 AS INT)").alias(
                "week_offset"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("v").alias("rev_c"),
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )  # triangle-sized frame
    return (
        rev.withColumn("cum_c", F.sum("rev_c").over(w))
        .join(F.broadcast(sizes), "cohort_week")
        .selectExpr(
            "cohort_week",
            "week_offset",
            "n_purchases",
            "CAST(rev_c AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue",
            "CAST(cum_c AS DOUBLE) / CAST(100 AS DOUBLE)"
            " AS cum_revenue",
            "cohort_size",
            halfup_ratio_sql("cum_c", "100 * cohort_size", 4)
            + " AS ltv_per_user",
        )
        .orderBy("cohort_week", "week_offset")
    )


QUERIES["cohort_ltv"] = cohort_ltv

_LTV_PCT_DUCK = halfup_ratio_sql(
    "cum_c", "100 * cohort_size", 4, engine="duck"
)

ORACLES["cohort_ltv"] = f"""
    WITH ev AS (
        SELECT user_id, event_type,
               CAST(date_trunc('week', CAST(ts AS TIMESTAMP))
                    AS DATE) AS week,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    ),
    first AS (
        SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1
    ),
    sizes AS (
        SELECT cohort_week, count(*) AS cohort_size
        FROM first GROUP BY 1
    ),
    rev AS (
        SELECT cohort_week,
               CAST(date_diff('day', cohort_week, week) // 7
                    AS INT) AS week_offset,
               count(*) AS n_purchases,
               CAST(sum(v) AS BIGINT) AS rev_c
        FROM ev JOIN first USING (user_id)
        WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT *,
               CAST(sum(rev_c) OVER (
                   PARTITION BY cohort_week ORDER BY week_offset
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
        FROM rev
    )
    SELECT cohort_week, week_offset, n_purchases,
           CAST(rev_c AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
           CAST(cum_c AS DOUBLE) / CAST(100 AS DOUBLE) AS cum_revenue,
           cohort_size,
           {_LTV_PCT_DUCK} AS ltv_per_user
    FROM cum JOIN sizes USING (cohort_week)
    ORDER BY cohort_week, week_offset
"""


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM-lite segmentation: every user is scored Recent/Frequent/
    Monetary against the CORPUS-MEAN thresholds and lands in one of
    8 segments (R+/R- x F+/F- x M+/M-), reported with segment size,
    average purchases, average spend, and share of users — the
    marketing-warehouse classic.

    Mean splits, not quintiles, by design (the ab_test_chi2
    discipline): exact equal-frequency quintiles need corpus-wide
    order statistics of per-user aggregates — a global sort — while
    the three means are one 1-row broadcast, and every comparison
    is exact integer cross-multiplication (x * n > sum, no
    division). Recency compares integer microseconds since each
    user's last event against the mean of those gaps (lower = more
    recent = R+, measured from the corpus max timestamp so the
    definition is reproducible).

    Scale shape: one user-keyed aggregate (map-side combinable),
    one 1-row broadcast of (n, sums), an 8-group rollup.
    """
    from ..functions.exact import cents, halfup_ratio_sql

    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.expr("unix_micros(ts)")).alias("last_us"),
            F.sum(
                F.expr("CAST(event_type = 'purchase' AS INT)")
            ).alias("freq"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        cents(F.col("value")),
                    )
                ),
                F.lit(0).cast("long"),
            ).alias("money_c"),
        )
        .localCheckpoint(eager=False)
    )
    # the recency gap needs the corpus max FIRST: one more pass over
    # the checkpointed user frame with the broadcast scalars
    base = per_user.crossJoin(
        F.broadcast(
            per_user.agg(
                F.count(F.lit(1)).alias("n"),
                F.max("last_us").alias("now_us"),
                F.sum("freq").alias("sum_f"),
                F.sum("money_c").alias("sum_m"),
            )
        )
    ).withColumn("rec_us", F.col("now_us") - F.col("last_us"))
    seg = base.crossJoin(
        F.broadcast(base.agg(F.sum("rec_us").alias("sum_r")))
    ).select(
        F.concat(
            F.when(
                F.col("rec_us") * F.col("n") < F.col("sum_r"), F.lit("R+")
            ).otherwise(F.lit("R-")),
            F.when(
                F.col("freq") * F.col("n") > F.col("sum_f"), F.lit("F+")
            ).otherwise(F.lit("F-")),
            F.when(
                F.col("money_c") * F.col("n") > F.col("sum_m"),
                F.lit("M+"),
            ).otherwise(F.lit("M-")),
        ).alias("segment"),
        "freq",
        "money_c",
        "n",
    )
    return (
        seg.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("freq").alias("sum_f"),
            F.sum("money_c").alias("sum_m"),
            F.max("n").alias("n_total"),
        )
        .selectExpr(
            "segment",
            "n_users",
            halfup_ratio_sql("sum_f", "n_users", 2, "spark")
            + " AS avg_purchases",
            halfup_ratio_sql("sum_m", "100 * n_users", 2, "spark")
            + " AS avg_spend",
            halfup_ratio_sql("100 * n_users", "n_total", 2, "spark")
            + " AS user_share_pct",
        )
        .orderBy("segment")
    )


QUERIES["rfm_segments"] = rfm_segments


def _rfm_oracle() -> str:
    from ..functions.exact import halfup_ratio_sql

    return f"""
        WITH per_user AS (
            SELECT user_id,
                   max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
                   CAST(sum(CAST(event_type = 'purchase' AS INT))
                        AS BIGINT) AS freq,
                   CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT) END), 0)
                       AS BIGINT) AS money_c
            FROM events GROUP BY user_id
        ),
        t1 AS (
            SELECT count(*) AS n, max(last_us) AS now_us,
                   CAST(sum(freq) AS BIGINT) AS sum_f,
                   CAST(sum(money_c) AS BIGINT) AS sum_m
            FROM per_user
        ),
        base AS (
            SELECT per_user.*, t1.*,
                   now_us - last_us AS rec_us
            FROM per_user, t1
        ),
        t2 AS (SELECT CAST(sum(rec_us) AS BIGINT) AS sum_r FROM base),
        seg AS (
            SELECT (CASE WHEN rec_us * n < sum_r
                         THEN 'R+' ELSE 'R-' END)
                || (CASE WHEN freq * n > sum_f
                         THEN 'F+' ELSE 'F-' END)
                || (CASE WHEN money_c * n > sum_m
                         THEN 'M+' ELSE 'M-' END) AS segment,
                   freq, money_c, n
            FROM base, t2
        ),
        g AS (
            SELECT segment, count(*) AS n_users,
                   CAST(sum(freq) AS BIGINT) AS sum_f,
                   CAST(sum(money_c) AS BIGINT) AS sum_m,
                   max(n) AS n_total
            FROM seg GROUP BY segment
        )
        SELECT segment, n_users,
               {halfup_ratio_sql('sum_f', 'n_users', 2, 'duck')}
                   AS avg_purchases,
               {halfup_ratio_sql('sum_m', '100 * n_users', 2, 'duck')}
                   AS avg_spend,
               {halfup_ratio_sql('100 * n_users', 'n_total', 2, 'duck')}
                   AS user_share_pct
        FROM g
        ORDER BY segment
    """


ORACLES["rfm_segments"] = _rfm_oracle()


#: 97.5th normal quantile for the 95% Wilson interval, shared text
WILSON_Z = "1.959963984540054"


def weekly_conversion_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly conversion rate (purchasing users / active users) with
    the 95% WILSON score interval — the uncertainty-aware trend
    line a growth dashboard needs (a raw ratio over a 40-user week
    looks like a crash; the interval says it's noise). Wilson, not
    normal-approximation, because weekly cohorts are small and
    rates sit near the boundary — exactly where the naive interval
    breaks (goes negative / past 1).

    Exactness: k (converters) and n (active users) are exact
    distinct counts from ONE two-flag user-week aggregate; the
    displayed rate is the integer half-up; the interval bounds are
    shared-text IEEE expressions over (k, n) and the z constant —
    bit-equal in both engines.

    Scale shape: one dedup aggregate on (user, week) with two
    conditional flags, one week-sized rollup. No broadcast, no
    window.
    """
    uw = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.to_date(F.date_trunc("week", "ts")).alias("week"),
            "user_id",
        )
        .agg(
            F.max(
                F.expr("CAST(event_type = 'purchase' AS INT)")
            ).alias("bought")
        )
    )
    per = uw.groupBy("week").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bought").alias("k"),
    )
    z, z2 = WILSON_Z, f"({WILSON_Z} * {WILSON_Z})"
    p = "(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
    center = f"({p} + {z2} / (2.0 * CAST(n AS DOUBLE)))"
    half = (
        f"({z} * sqrt({p} * (1.0 - {p}) / CAST(n AS DOUBLE)"
        f" + {z2} / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
    )
    denom = f"(1.0 + {z2} / CAST(n AS DOUBLE))"
    return per.selectExpr(
        "week",
        "n",
        "k",
        halfup_ratio_sql("100 * k", "n", 2, "spark")
        + " AS conversion_pct",
        f"({center} - {half}) / {denom} AS wilson_lo",
        f"({center} + {half}) / {denom} AS wilson_hi",
    ).orderBy("week")


QUERIES["weekly_conversion_ci"] = weekly_conversion_ci


def _weekly_ci_oracle() -> str:
    z, z2 = WILSON_Z, f"({WILSON_Z} * {WILSON_Z})"
    p = "(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
    center = f"({p} + {z2} / (2.0 * CAST(n AS DOUBLE)))"
    half = (
        f"({z} * sqrt({p} * (1.0 - {p}) / CAST(n AS DOUBLE)"
        f" + {z2} / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
    )
    denom = f"(1.0 + {z2} / CAST(n AS DOUBLE))"
    return f"""
        WITH uw AS (
            SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP))
                        AS DATE) AS week,
                   user_id,
                   max(CAST(event_type = 'purchase' AS INT))
                       AS bought
            FROM events GROUP BY 1, 2
        ),
        per AS (
            SELECT week, count(*) AS n,
                   CAST(sum(bought) AS BIGINT) AS k
            FROM uw GROUP BY week
        )
        SELECT week, n, k,
               {halfup_ratio_sql('100 * k', 'n', 2, 'duck')}
                   AS conversion_pct,
               ({center} - {half}) / {denom} AS wilson_lo,
               ({center} + {half}) / {denom} AS wilson_hi
        FROM per
        ORDER BY week
    """


ORACLES["weekly_conversion_ci"] = _weekly_ci_oracle()


def web_order_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE channel bridge: the events stream and the TPC-H
    order book describe the same customers (user_id == c_custkey,
    the identity the OD kernel already relies on), so this is the
    per-nation channel overlap every omnichannel warehouse builds —
    customers, order-book buyers, web-active users, the overlap,
    and whether web-active customers place MORE orders (the
    half-up per-capita comparison).

    The only query in the suite that joins the event stream to the
    relational star: two distinct-key profiles (events -> distinct
    user; orders -> per-customer counts) joined onto the customer
    dim and rolled up to the bounded nation domain.

    Scale shape: the events dedup and the orders rollup are
    map-side-combinable on their natural keys; the customer dim
    join shuffles on custkey; the nation rollup is 25 groups; the
    nation name join is a broadcast.
    """
    web = (
        load(spark, sf_dir, "events")
        .select(F.col("user_id").alias("c_custkey"))
        .distinct()
        .withColumn("is_web", F.lit(1))
    )
    orders = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    per = (
        cust.join(web, "c_custkey", "left")
        .join(orders, "c_custkey", "left")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.coalesce("is_web", F.lit(0))).alias("n_web"),
            F.sum(
                F.expr("CAST(coalesce(n_orders, 0) > 0 AS INT)")
            ).alias("n_buyers"),
            F.sum(
                F.expr(
                    "CAST(coalesce(is_web, 0) = 1"
                    " AND coalesce(n_orders, 0) > 0 AS INT)"
                )
            ).alias("n_web_buyers"),
            F.sum(
                F.expr("coalesce(is_web, 0) * coalesce(n_orders, 0)")
            ).alias("web_orders"),
            F.sum(
                F.expr(
                    "(1 - coalesce(is_web, 0)) * coalesce(n_orders, 0)"
                )
            ).alias("nonweb_orders"),
        )
    )
    return (
        per.join(F.broadcast(nation), "c_nationkey")
        .selectExpr(
            "nation",
            "n_customers",
            "n_web",
            "n_buyers",
            "n_web_buyers",
            halfup_ratio_sql("100 * n_web", "n_customers", 2, "spark")
            + " AS web_pct",
            "CASE WHEN n_web > 0 THEN "
            + halfup_ratio_sql("web_orders", "n_web", 2, "spark")
            + " END AS orders_per_web_user",
            "CASE WHEN n_customers - n_web > 0 THEN "
            + halfup_ratio_sql(
                "nonweb_orders", "n_customers - n_web", 2, "spark"
            )
            + " END AS orders_per_other_user",
        )
        .orderBy("nation")
    )


QUERIES["web_order_bridge"] = web_order_bridge


def _bridge_oracle() -> str:
    return f"""
        WITH web AS (
            SELECT DISTINCT user_id AS c_custkey, 1 AS is_web
            FROM events
        ),
        ords AS (
            SELECT o_custkey AS c_custkey, count(*) AS n_orders
            FROM orders GROUP BY 1
        ),
        per AS (
            SELECT c.c_nationkey,
                   count(*) AS n_customers,
                   CAST(sum(coalesce(w.is_web, 0)) AS BIGINT)
                       AS n_web,
                   CAST(sum(CAST(coalesce(o.n_orders, 0) > 0 AS INT))
                       AS BIGINT) AS n_buyers,
                   CAST(sum(CAST(coalesce(w.is_web, 0) = 1
                       AND coalesce(o.n_orders, 0) > 0 AS INT))
                       AS BIGINT) AS n_web_buyers,
                   CAST(sum(coalesce(w.is_web, 0)
                       * coalesce(o.n_orders, 0)) AS BIGINT)
                       AS web_orders,
                   CAST(sum((1 - coalesce(w.is_web, 0))
                       * coalesce(o.n_orders, 0)) AS BIGINT)
                       AS nonweb_orders
            FROM customer c
            LEFT JOIN web w USING (c_custkey)
            LEFT JOIN ords o USING (c_custkey)
            GROUP BY 1
        )
        SELECT n.n_name AS nation,
               per.n_customers, per.n_web, per.n_buyers,
               per.n_web_buyers,
               {halfup_ratio_sql('100 * n_web', 'n_customers', 2, 'duck')}
                   AS web_pct,
               CASE WHEN n_web > 0 THEN
                   {halfup_ratio_sql('web_orders', 'n_web', 2, 'duck')}
               END AS orders_per_web_user,
               CASE WHEN n_customers - n_web > 0 THEN
                   {halfup_ratio_sql('nonweb_orders',
                                     'n_customers - n_web', 2, 'duck')}
               END AS orders_per_other_user
        FROM per JOIN nation n ON n.n_nationkey = per.c_nationkey
        ORDER BY nation
    """


ORACLES["web_order_bridge"] = _bridge_oracle()


# -------------------------------------------- survival analysis

#: per-user observation window: a user who has not purchased within
#: this many days of their first event is right-CENSORED at the
#: window edge (or at the corpus end, whichever comes first)
SURVIVAL_WINDOW_DAYS = 5

#: Kaplan-Meier state scale (parts per million)
SURVIVAL_PPM = 1_000_000


def retention_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion curve: days from a user's
    first event to their first PURCHASE, right-censored at the
    SURVIVAL_WINDOW_DAYS observation edge (or the corpus end for
    late joiners) — the survival instrument ordered_funnel can't
    give: a user still inside their window has unobserved
    conversion, and counting them as non-converters biases the
    conversion-rate estimate; KM re-weights the risk set instead.
    Per observed exit day t: the at-risk count (exit time >= t),
    conversions and censorings at exactly t, and
    S(t) = prod_{s<=t, d_s>0} (n_s-d_s)/n_s (probability of
    remaining unconverted past t).

    Exactness: the product recurrence runs in integer ppm — s <-
    halfup(s*(n-d)/n) via (2*s*(n-d) + n) div (2*n), non-negative
    operands so Spark `div` and DuckDB `//` agree — bit-identical at
    every step in both engines (the holt_forecast integer-state
    discipline). Headroom: 2*s*(n-d) <= 2e6 * n_users, inside bigint
    through ~4.6e12 users; DuckDB errors loudly past that.

    Scale shape: ONE map-side-combinable groupBy(user) collapses the
    corpus to per-user (first event, first purchase) bounds;
    everything after is EXIT-DAY-DOMAIN sized (bounded by the
    observation window, never by user count): the exit histogram,
    its suffix-sum risk window (ordered over the <=W+1 distinct exit
    days — the stats.py histogram order-statistic idiom, never a
    per-entity global window), and the sequential KM fold over that
    bounded array inside one whole-stage aggregate() expression (no
    UDF, no driver loop).
    """
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("first_day"),
            F.min(
                F.when(
                    F.col("event_type") == "purchase", F.to_date("ts")
                )
            ).alias("purchase_day"),
        )
        .localCheckpoint(eager=False)
    )
    horizon = per_user.agg(
        F.max(F.greatest("first_day", "purchase_day")).alias("max_day")
    )
    exits = (
        per_user.crossJoin(F.broadcast(horizon))
        .selectExpr(
            "datediff(purchase_day, first_day) AS pd",
            f"least({SURVIVAL_WINDOW_DAYS},"
            " datediff(max_day, first_day)) AS ow",
        )
        .selectExpr(
            "CASE WHEN pd IS NOT NULL AND pd <= ow THEN pd"
            " ELSE ow END AS t",
            "CAST(pd IS NOT NULL AND pd <= ow AS INT) AS converted",
        )
        .groupBy("t")
        .agg(
            F.expr("sum(converted)").alias("d"),
            F.expr("sum(1 - converted)").alias("c"),
        )
    )
    # at-risk = suffix sum over the bounded exit-day histogram
    risk = exits.withColumn(
        "n",
        F.expr(
            "sum(d + c) OVER (ORDER BY t DESC"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ),
    )
    stype = "struct<t:int,n:bigint,d:bigint,c:bigint,s:bigint>"
    s_prev = (
        f"if(size(acc) = 0, CAST({SURVIVAL_PPM} AS BIGINT),"
        " element_at(acc, -1).s)"
    )
    s_new = (
        f"CASE WHEN x.d > 0 THEN"
        f" (2 * ({s_prev}) * (x.n - x.d) + x.n) div (2 * x.n)"
        f" ELSE ({s_prev}) END"
    )
    fold = f"""
        aggregate(
            sort_array(collect_list(struct(t, n, d, c))),
            CAST(array() AS array<{stype}>),
            (acc, x) -> concat(acc, array(named_struct(
                't', x.t, 'n', x.n, 'd', x.d, 'c', x.c,
                's', CAST({s_new} AS BIGINT)))))
    """
    return (
        risk.agg(F.expr(fold).alias("rows"))
        .select(F.explode("rows").alias("r"))
        .selectExpr(
            "CAST(r.t AS BIGINT) AS t_days",
            "r.n AS n_risk",
            "r.d AS n_converted",
            "r.c AS n_censored",
            "r.s AS survival_ppm",
            f"CAST(r.s AS DOUBLE) / CAST({SURVIVAL_PPM} AS DOUBLE)"
            " AS survival",
        )
        .orderBy("t_days")
    )


QUERIES["retention_survival"] = retention_survival


def _survival_oracle() -> str:
    s_new = (
        "CASE WHEN ser.d > 0 THEN"
        " (2 * r.s * (ser.n - ser.d) + ser.n) // (2 * ser.n)"
        " ELSE r.s END"
    ).replace("ser.", "((SELECT s FROM ordered)[r.i + 1]).")
    return f"""
        WITH RECURSIVE per_user AS (
            SELECT user_id,
                   min(CAST(ts AS DATE)) AS first_day,
                   min(CASE WHEN event_type = 'purchase'
                       THEN CAST(ts AS DATE) END) AS purchase_day
            FROM events GROUP BY user_id
        ),
        horizon AS (
            SELECT max(greatest(first_day,
                       coalesce(purchase_day, first_day))) AS max_day
            FROM per_user
        ),
        marked AS (
            SELECT datediff('day', first_day, purchase_day) AS pd,
                   least({SURVIVAL_WINDOW_DAYS},
                         datediff('day', first_day,
                                  (SELECT max_day FROM horizon)))
                       AS ow
            FROM per_user
        ),
        exits AS (
            SELECT CASE WHEN pd IS NOT NULL AND pd <= ow THEN pd
                        ELSE ow END AS t,
                   CAST(sum(CASE WHEN pd IS NOT NULL AND pd <= ow
                        THEN 1 ELSE 0 END) AS BIGINT) AS d,
                   CAST(sum(CASE WHEN pd IS NOT NULL AND pd <= ow
                        THEN 0 ELSE 1 END) AS BIGINT) AS c
            FROM marked GROUP BY 1
        ),
        risk AS (
            SELECT t, d, c,
                   CAST(sum(d + c) OVER (ORDER BY t DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS n
            FROM exits
        ),
        ordered AS (
            SELECT list(struct_pack(t := t, n := n, d := d, c := c)
                        ORDER BY t) AS s,
                   count(*) AS cnt
            FROM risk
        ),
        rec(i, s) AS (
            SELECT 0, CAST({SURVIVAL_PPM} AS BIGINT)
            UNION ALL
            SELECT r.i + 1, CAST({s_new} AS BIGINT)
            FROM rec r
            WHERE r.i < (SELECT cnt FROM ordered)
        )
        SELECT CAST(row.t AS BIGINT) AS t_days,
               row.n AS n_risk,
               row.d AS n_converted,
               row.c AS n_censored,
               rec.s AS survival_ppm,
               CAST(rec.s AS DOUBLE)
                   / CAST({SURVIVAL_PPM} AS DOUBLE) AS survival
        FROM rec
        JOIN LATERAL (
            SELECT (SELECT s FROM ordered)[rec.i] AS row
        ) ON rec.i >= 1
        ORDER BY t_days
    """


ORACLES["retention_survival"] = _survival_oracle()
