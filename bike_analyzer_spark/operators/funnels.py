"""Batch twins of the stream-stream interval-join matrix (SURVEY.md
§2.9) — driver-gated, so the join SEMANTICS earn DuckDB-oracle
evidence, not just pytest parity.

The streaming module's `conversion_join_*` functions are written to
run identically on batch and streaming frames (withWatermark is a
no-op on batch); tests/test_stream_join.py pins streaming==batch per
variant, and these two queries put the batch side itself under the
driver's correctness gate (r9 verdict ask #7):

- `funnel_attribution_audit` — the RIGHT-OUTER interval join: every
  purchase, attributed to a qualifying view within the horizon or
  flagged organic (`streaming/joins.py:144`).
- `funnel_full_ledger` — the FULL-OUTER interval join: matches,
  never-converted views, and unattributed purchases in one ledger
  (`streaming/joins.py:174`).

The INNER and LEFT-OUTER variants already carry driver-adjacent
evidence through the funnel queries built on them; right/full were
pytest-only until now.

Scale shape: one equi-join shuffle on user_id with the event-time
range condition evaluated inside the join (never a cross join); in
streaming the same condition is what bounds both state buffers.
Chains of views x purchases per user stay bounded by per-user
activity within the horizon — the classic interval-join fan-out, the
same at any corpus size.

Reference parity: none (the reference has no streaming); part of the
beyond-reference streaming pack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load
from ..streaming.joins import (
    CONVERSION_HORIZON_MIN,
    conversion_join_full_outer,
    conversion_join_right_outer,
)

#: sentinel for the absent side of an outer-join row (real ids and
#: epoch-micros are non-negative, so -1 can't collide). The corpus
#: convention is NULL-FREE query output — the driver gate and
#: full_sim compare sorted raw tuples, which a NULL breaks — so the
#: batch twins surface the outer rows through sentinels while the
#: streaming operators keep honest SQL NULLs.
ABSENT = -1


def _sentineled(joined: DataFrame) -> DataFrame:
    """Project the outer-join frame to a NULL-free driver shape:
    ids stay, timestamps become epoch micros, absent side -> -1."""
    cols = [
        "user_id",
        F.coalesce("view_id", F.lit(ABSENT)).alias("view_id"),
        F.coalesce("purchase_id", F.lit(ABSENT)).alias("purchase_id"),
        F.coalesce(
            F.unix_micros("view_ts"), F.lit(ABSENT)
        ).alias("view_us"),
        F.coalesce(
            F.unix_micros("purchase_ts"), F.lit(ABSENT)
        ).alias("purchase_us"),
        F.coalesce("us_to_convert", F.lit(ABSENT)).alias(
            "us_to_convert"
        ),
    ]
    cols += [c for c in ("converted", "attributed") if c in joined.columns]
    return joined.select(*cols)


def funnel_attribution_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: every purchase with its qualifying views (view
    within [purchase_ts - horizon, purchase_ts], same user) or a
    sentinel-view row when organic — the batch run of the streaming
    right-outer interval join."""
    return _sentineled(
        conversion_join_right_outer(load(spark, sf_dir, "events"))
    )


def funnel_full_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the complete funnel ledger — matched pairs,
    views that never converted, purchases no view explains — the
    batch run of the streaming full-outer interval join."""
    return _sentineled(
        conversion_join_full_outer(load(spark, sf_dir, "events"))
    )


QUERIES = {
    "funnel_attribution_audit": funnel_attribution_audit,
    "funnel_full_ledger": funnel_full_ledger,
}

_SIDES = f"""
    views AS (
        SELECT user_id, event_id AS view_id, ts AS view_ts
        FROM events WHERE event_type = 'view'
    ),
    purchases AS (
        SELECT user_id AS p_user, event_id AS purchase_id,
               ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    )
"""

_COND = f"""
    ON user_id = p_user
    AND purchase_ts >= view_ts
    AND purchase_ts <= view_ts + INTERVAL {CONVERSION_HORIZON_MIN} MINUTE
"""

_PROJ = f"""
    coalesce(user_id, p_user) AS user_id,
    coalesce(view_id, {ABSENT}) AS view_id,
    coalesce(purchase_id, {ABSENT}) AS purchase_id,
    coalesce(epoch_us(view_ts), {ABSENT}) AS view_us,
    coalesce(epoch_us(purchase_ts), {ABSENT}) AS purchase_us,
    coalesce(epoch_us(purchase_ts) - epoch_us(view_ts), {ABSENT})
        AS us_to_convert
"""

ORACLES = {
    "funnel_attribution_audit": f"""
        WITH {_SIDES}
        SELECT {_PROJ},
               view_id IS NOT NULL AS attributed
        FROM views RIGHT JOIN purchases {_COND}
        ORDER BY purchase_id, view_id
    """,
    "funnel_full_ledger": f"""
        WITH {_SIDES}
        SELECT {_PROJ},
               purchase_id IS NOT NULL AS converted,
               view_id IS NOT NULL AS attributed
        FROM views FULL JOIN purchases {_COND}
        ORDER BY view_id, purchase_id
    """,
}


def funnel_strict_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-grain strict-order funnel: per user, the earliest view,
    the earliest click STRICTLY AFTER that view, and the earliest
    purchase strictly after that click — the greedy
    earliest-completion chain (the standard funnel semantics BI tools
    implement, where a click that precedes every view doesn't count).
    Complements `useranalytics.ordered_funnel` (day-grain step
    ordering) with intra-day event-time ordering.

    Returns one NULL-free row per user who has at least one view:
    (user_id, v_us, c_us, p_us, stage) with -1 sentinels for
    unreached steps and stage in {1,2,3}.

    Greedy-earliest is the CORRECT maximal-completion strategy here:
    if any (v', c', p') chain exists, then the earliest view v <= v'
    admits c <= c' (c' is after v' >= v), which admits p <= p' — so
    taking the minimum at each stage never forfeits a completion.

    Scale shape: three user-keyed aggregates, each one map-side-
    combinable min over a filtered scan slice, chained by user-keyed
    joins — no windows, no corpus sort; the shuffle key is user_id
    throughout, so the three stages co-partition under AQE."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
        .localCheckpoint(eager=False)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("us") > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    return (
        views.join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .select(
            "user_id",
            "v_us",
            F.coalesce("c_us", F.lit(ABSENT)).alias("c_us"),
            F.coalesce("p_us", F.lit(ABSENT)).alias("p_us"),
            (
                F.lit(1)
                + F.col("c_us").isNotNull().cast("int")
                + F.col("p_us").isNotNull().cast("int")
            ).alias("stage"),
        )
        .orderBy("user_id")
    )


QUERIES["funnel_strict_sequence"] = funnel_strict_sequence

ORACLES["funnel_strict_sequence"] = f"""
    WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    v AS (
        SELECT user_id, min(us) AS v_us FROM ev
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.us) AS c_us
        FROM ev e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.us > v.v_us
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.us) AS p_us
        FROM ev e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.us > c.c_us
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.v_us,
           coalesce(c.c_us, {ABSENT}) AS c_us,
           coalesce(p.p_us, {ABSENT}) AS p_us,
           1 + CAST(c.c_us IS NOT NULL AS INT)
             + CAST(p.p_us IS NOT NULL AS INT) AS stage
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    ORDER BY v.user_id
"""
