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
