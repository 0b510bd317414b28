"""Experimentation analytics — the A/B-test readout a product
warehouse runs daily: deterministic hash-based arm assignment, a
2x2 contingency table of a user-level outcome, per-arm rates, and
the chi-square independence statistic with its 95% verdict.

Reference scope: the reference dashboard stops at descriptive KPIs
(`streamlit_app.py`); the first INFERENTIAL question a team asks of
the same events — "did the treatment change behavior, or is the
split just noise?" — needs the chi-square machinery. Built here as
an A/A harness: arms come from a salted hash of user_id (the
industry-standard assignment, reproducible across engines via
`functions/textfns.hash64`), so the expected verdict is "not
significant" and any significant readout flags a broken splitter.

Outcome definition that survives scale: "above-mean spender" —
user's purchase cents x n_users > total purchase cents, a strict
integer comparison. A FIXED spend threshold degenerates as SF grows
(per-user event counts grow with the corpus, so every user
eventually clears it); the mean re-centers itself at every SF and
costs one broadcast scalar, where an exact MEDIAN of near-unique
per-user sums would need a corpus-wide sort.

Cross-engine exactness: the cells a/b/c/d and margins are exact
integer counts; the chi-square statistic is ONE IEEE-double
expression over those integers (the `stats.py` shared-text
discipline — identical text, identical operand order, bit-equal
everywhere), so even the boolean 95% verdict (chi2 > 3.8414588…)
is deterministic. Per-arm rates ride `halfup_ratio_sql`. No double
is ever round()-ed.

Scale shape: one map-side-combinable groupBy(user_id) over the fact
scan -> user-sized frame (checkpointed once, consumed twice), a
1-row total broadcast, then a 1-row conditional aggregate. No
corpus-wide sort, no window, no skew (user_id is the shuffle key).
Headroom: the chi-square doubles hold exactly through cell counts
~2^26 and stay well-conditioned far beyond (double ops are the
SAME rounded values in both engines regardless); the integer spend
total overflows bigint only past ~9e16 cents (~$900T).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import cents, halfup_ratio_sql
from ..functions.textfns import hash64, hash64_duck
from ..sources.catalog import load

#: assignment salt — changing it re-randomizes every experiment
EXP_SALT = "exp8"

#: chi-square 95% critical value, 1 degree of freedom
CHI2_CRIT_95 = "3.841458820694124"

_D = "CAST({} AS DOUBLE)"


def _d(expr: str) -> str:
    return _D.format(expr)


# 2x2 chi-square over integer cells, shared verbatim by both engines:
# chi2 = n*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)), squared via an explicit
# self-multiply so no pow() spelling can drift between engines.
_DIFF = f"({_d('a')} * {_d('d')} - {_d('b')} * {_d('c')})"
_CHI2 = (
    f"CASE WHEN a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0"
    f" THEN {_d('n_users')} * {_DIFF} * {_DIFF}"
    f" / ({_d('a + b')} * {_d('c + d')} * {_d('a + c')} * {_d('b + d')})"
    f" ELSE NULL END"
)

_FINAL_COLS = [
    "n_users",
    "a",
    "b",
    "c",
    "d",
    # conversion ("above-mean") rate per arm, half-up 6 decimals
    "{rate0} AS rate_arm0",
    "{rate1} AS rate_arm1",
    f"{_CHI2} AS chi2",
    f"({_CHI2}) > {CHI2_CRIT_95} AS significant",
]


def _final(engine: str) -> list[str]:
    return [
        c.format(
            rate0=halfup_ratio_sql("a", "a + b", 6, engine),
            rate1=halfup_ratio_sql("c", "c + d", 6, engine),
        )
        for c in _FINAL_COLS
    ]


def ab_test_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row A/A readout: hash-split users into two arms, outcome
    = above-mean purchase spend, cells a/b (arm 0 above/not) and
    c/d (arm 1), per-arm rates, chi-square, 95% verdict."""
    spend = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        cents(F.col("value")),
                    )
                ),
                F.lit(0).cast("long"),
            ).alias("spend_c")
        )
        .select(
            (hash64(F.col("user_id").cast("string"), EXP_SALT) % 2).alias(
                "arm"
            ),
            "spend_c",
        )
        .localCheckpoint(eager=False)
    )
    totals = spend.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("spend_c").alias("total_c"),
    )
    cells = (
        spend.crossJoin(F.broadcast(totals))
        .withColumn(
            "above", F.col("spend_c") * F.col("n_users") > F.col("total_c")
        )
        .groupBy()
        .agg(
            F.max("n_users").alias("n_users"),
            F.sum(F.expr("CAST(arm = 0 AND above AS INT)")).alias("a"),
            F.sum(F.expr("CAST(arm = 0 AND NOT above AS INT)")).alias("b"),
            F.sum(F.expr("CAST(arm = 1 AND above AS INT)")).alias("c"),
            F.sum(F.expr("CAST(arm = 1 AND NOT above AS INT)")).alias("d"),
        )
    )
    return cells.selectExpr(*_final("spark"))


#: CUPED assignment salt (independent of the chi-square experiment)
CUPED_SALT = "cuped9"

# CUPED arithmetic, shared verbatim by both engines (the chi-square
# discipline: every double comes from ONE identical-text expression
# over exact integer aggregates — identical operand order, bit-equal
# everywhere; no round(), no pow()).
#   theta = cov(X, Y)/var(X) = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)
# with the zero-variance fallback theta = 0 (no adjustment) so the
# output is never NULL.
_THETA = (
    f"CASE WHEN {_d('n_users')} * {_d('sxx')}"
    f" - {_d('sx')} * {_d('sx')} > 0"
    f" THEN ({_d('n_users')} * {_d('sxy')} - {_d('sx')} * {_d('sy')})"
    f" / ({_d('n_users')} * {_d('sxx')} - {_d('sx')} * {_d('sx')})"
    f" ELSE 0.0 END"
)
_MEAN_POST = f"{_d('post_c')} / {_d('n_arm')}"
_MEAN_POST_ADJ = (
    f"{_MEAN_POST} - ({_THETA})"
    f" * ({_d('pre_c')} / {_d('n_arm')} - {_d('sx')} / {_d('n_users')})"
)

_CUPED_COLS = [
    "arm",
    "n_arm",
    "pre_c",
    "post_c",
    f"{_THETA} AS theta",
    f"{_MEAN_POST} AS mean_post",
    f"{_MEAN_POST_ADJ} AS mean_post_adj",
]


def ab_cuped_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng, Xu, Kohavi, Walker —
    WSDM'13): per-user PRE-period purchase spend (events before the
    observed time midpoint) is the covariate X; POST-period spend is
    the metric Y; theta = cov(X,Y)/var(X) pooled over all users, and
    each arm reports its raw and adjusted post-period mean

        mean_post_adj = mean(Y_a) - theta * (mean(X_a) - mean(X)).

    The adjustment strips the between-user variance X explains —
    the industry-standard sensitivity boost for experiment metrics —
    and leaves the treatment effect unbiased because assignment (a
    salted hash) is independent of X.

    Cross-engine exactness: X and Y are exact integer cents; the
    pooled moments (Sx, Sy, Sxx, Sxy) are exact DECIMAL(38,0)/
    HUGEINT sums; every double is one shared-text expression over
    those integers. The time midpoint is integer epoch-micros
    arithmetic ((min+max) div 2 — non-negative, so div and // agree).

    Scale shape: one groupBy(user_id) over the fact scan (the only
    data-sized shuffle), a 1-row bounds broadcast, a 1-row pooled-
    moments broadcast onto the 2-row arm frame. Two rows out."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("us"),
    )
    bounds = ev.agg(F.expr("(min(us) + max(us)) div 2").alias("mid_us"))
    spend_col = cents(F.col("value"))
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.col("us") <= F.col("mid_us")),
                        spend_col,
                    )
                ),
                F.lit(0).cast("long"),
            ).alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.col("us") > F.col("mid_us")),
                        spend_col,
                    )
                ),
                F.lit(0).cast("long"),
            ).alias("y"),
        )
        .select(
            (hash64(F.col("user_id").cast("string"), CUPED_SALT) % 2)
            .alias("arm"),
            "x",
            "y",
        )
        .localCheckpoint(eager=False)
    )
    dec = "decimal(38,0)"
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_arm"),
        F.sum("x").alias("pre_c"),
        F.sum("y").alias("post_c"),
    )
    return (
        arms.crossJoin(F.broadcast(pooled))
        .selectExpr(*_CUPED_COLS)
        .orderBy("arm")
    )


QUERIES = {"ab_test_chi2": ab_test_chi2, "ab_cuped_readout": ab_cuped_readout}

_ARM = f"{hash64_duck('CAST(user_id AS VARCHAR)', repr(EXP_SALT))} % 2"

ORACLES = {
    "ab_test_chi2": f"""
        WITH spend AS (
            SELECT {_ARM} AS arm,
                   CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                            THEN CAST(round(value * 100) AS BIGINT)
                        END), 0) AS BIGINT) AS spend_c
            FROM events GROUP BY user_id
        ),
        totals AS (
            SELECT count(*) AS n_users,
                   CAST(sum(spend_c) AS BIGINT) AS total_c
            FROM spend
        ),
        cells AS (
            SELECT max(n_users) AS n_users,
                   CAST(sum(CAST(arm = 0 AND above AS INT)) AS BIGINT) AS a,
                   CAST(sum(CAST(arm = 0 AND NOT above AS INT)) AS BIGINT)
                       AS b,
                   CAST(sum(CAST(arm = 1 AND above AS INT)) AS BIGINT) AS c,
                   CAST(sum(CAST(arm = 1 AND NOT above AS INT)) AS BIGINT)
                       AS d
            FROM (
                SELECT arm, spend_c * n_users > total_c AS above, n_users
                FROM spend, totals
            )
        )
        SELECT {', '.join(_final('duck'))}
        FROM cells
    """,
}

_ARM_CUPED = f"{hash64_duck('CAST(user_id AS VARCHAR)', repr(CUPED_SALT))} % 2"

ORACLES["ab_cuped_readout"] = f"""
    WITH b AS (
        SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid_us
        FROM events
    ),
    pu AS (
        SELECT {_ARM_CUPED} AS arm,
               CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                        AND epoch_us(ts) <= mid_us
                        THEN CAST(round(value * 100) AS BIGINT)
                    END), 0) AS BIGINT) AS x,
               CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                        AND epoch_us(ts) > mid_us
                        THEN CAST(round(value * 100) AS BIGINT)
                    END), 0) AS BIGINT) AS y
        FROM events, b GROUP BY user_id
    ),
    pooled AS (
        SELECT count(*) AS n_users,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(x AS HUGEINT) * y) AS sxy
        FROM pu
    ),
    arms AS (
        SELECT arm, count(*) AS n_arm,
               CAST(sum(x) AS BIGINT) AS pre_c,
               CAST(sum(y) AS BIGINT) AS post_c
        FROM pu GROUP BY arm
    )
    SELECT {', '.join(_CUPED_COLS)}
    FROM arms, pooled
    ORDER BY arm
"""
