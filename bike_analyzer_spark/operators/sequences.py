"""Event-sequence analytics — the per-user Markov transition matrix
and the autocorrelation function of the hourly activity series.

Reference scope: the reference's event queries stop at marginal
distributions (counts per type / per hour — `analysis.py`,
`sql/queries.sql`); the two standard next questions a product stack
asks are ORDER-dependent: "given a user just did X, what do they do
next?" (the first-order Markov transition matrix over per-user
event sequences) and "how self-similar is the activity series
hour-over-hour?" (the ACF — the instrument behind seasonality
detection and forecast-model selection).

Exactness:
* transition probabilities are `functions.exact.halfup_ratio_sql`
  over exact integer (pair count, row total) — never a rounded
  double;
* the ACF at lag k is computed entirely in integers via the
  multiply-through identity (m = S/n is the mean of the DENSE
  hourly series, zeros included):

    num_k = sum_{t=k}^{n-1} (c_t - m)(c_{t-k} - m)
    n^2*num_k = n^2*P_k - n*S*(A_k + B_k) + (n-k)*S^2
    n^2*den   = n^2*Q   - n*S^2

  with P_k = sum c_t*c_{t-k} (observed pairs only — zero hours
  contribute nothing), A_k = S - head_k, B_k = S - tail_k where
  head_k/tail_k are the first/last-k-hour partial sums, and
  Q = sum c^2. The quotient is ONE shared-text double division of
  two 128-bit integers (Spark DECIMAL(38,0) / DuckDB HUGEINT —
  both round-to-nearest the same exact integer, so the doubles are
  bit-identical). Headroom: the largest intermediate is n*S*(A+B)
  <= 2*n*S^2 — at 10^12 events over 10^5 hours that is ~2*10^29,
  safely inside the 38-digit decimal range (bigint would wrap at
  S ~ 3*10^9, which is why the wide form is not optional).

Scale shape: the transition matrix is one shuffle on `user_id`
(the lag window) followed by a |types|^2-row aggregate; the ACF
pre-aggregates the corpus to the TIME-bounded hourly series (the
only corpus-sized shuffle), after which every join — the K-lag
self-join via an explode of K shift keys (an equi join, never a
range join), the head/tail offset folds, the K-row assembly — runs
on span-hours-sized frames. No global window exists anywhere: the
series needs no dense materialization because zero hours cancel
out of every sum analytically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import floordiv_duck, floordiv_sql, halfup_ratio_sql
from ..sources.catalog import load

#: displayed digits of the transition probability
TRANSITION_DIGITS = 4

#: ACF lags emitted (1..K)
ACF_LAGS = 6

#: microseconds per hour — the integer hour index base (gapfill.py)
HOUR_US = 3_600_000_000

#: floor-division hour bucket for the DuckDB oracles (twin of the
#: Spark side's floordiv_sql; see functions/exact.py)
_H_FLOOR = floordiv_duck("epoch_us(ts)", HOUR_US)


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences ordered by (ts, event_id): for each (from_type,
    to_type), the transition count and the half-up conditional
    probability P(next = to | current = from)."""
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("to_type"),
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("from_type"),
    )
    pairs = (
        seq.where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    # the row total is a |types|-row frame — broadcast side of the join
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").alias("row_total")
    )
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .selectExpr(
            "from_type",
            "to_type",
            "n_transitions",
            f"{halfup_ratio_sql('n_transitions', 'row_total', TRANSITION_DIGITS, 'spark')}"
            " AS p_next",
        )
        .orderBy("from_type", "to_type")
    )


def _acf_frac(engine: str) -> tuple[str, str]:
    """(numerator, denominator) of r_k, 128-bit integer expressions
    over columns k, n, s, q, p, hd, tl — shared structure, engine-
    specific wide-integer spelling."""
    wide = "DECIMAL(38,0)" if engine == "spark" else "HUGEINT"
    num = (
        f"(CAST(n AS {wide}) * n * p"
        f" - CAST(n AS {wide}) * s * ((s - hd) + (s - tl))"
        f" + CAST(n - k AS {wide}) * s * s)"
    )
    den = f"(CAST(n AS {wide}) * n * q - CAST(n AS {wide}) * s * s)"
    return num, den


def activity_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the dense hourly event-count series
    at lags 1..ACF_LAGS, as one exact-integer ratio per lag."""
    counts = (
        load(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(
            F.expr(floordiv_sql("unix_micros(ts)", HOUR_US)).alias("h")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    bounds = counts.agg(
        F.min("h").alias("h0"),
        F.max("h").alias("h1"),
        (F.max("h") - F.min("h") + F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.expr("sum(c * c)").alias("q"),
    )
    ks = bounds.select(
        F.explode(F.sequence(F.lit(1), F.lit(ACF_LAGS))).alias("k"),
        "n",
        "s",
        "q",
        "h0",
        "h1",
    )
    # P_k: equi self-join of the observed series on the shifted hour
    # key (each row exploded into its K shift targets)
    shifted = counts.select(
        F.explode(F.sequence(F.lit(1), F.lit(ACF_LAGS))).alias("k"),
        (F.col("h")).alias("ht"),
        F.col("c").alias("ct"),
    ).withColumn("h", F.col("ht") - F.col("k"))
    p = (
        shifted.join(counts.select("h", F.col("c").alias("cs")), "h")
        .groupBy("k")
        .agg(F.expr("sum(ct * cs)").alias("p"))
    )
    # head_k / tail_k: each boundary-offset count folds into every
    # k strictly above its offset (filter BEFORE sequence — Spark's
    # sequence(a, b) with a > b descends instead of emitting empty)
    b1 = bounds.select("h0", "h1")
    hd = (
        counts.crossJoin(F.broadcast(b1))
        .withColumn("d", F.col("h") - F.col("h0"))
        .where(F.col("d") < ACF_LAGS)
        .select(
            F.explode(
                F.sequence(F.col("d") + 1, F.lit(ACF_LAGS))
            ).alias("k"),
            "c",
        )
        .groupBy("k")
        .agg(F.sum("c").alias("hd"))
    )
    tl = (
        counts.crossJoin(F.broadcast(b1))
        .withColumn("e", F.col("h1") - F.col("h"))
        .where(F.col("e") < ACF_LAGS)
        .select(
            F.explode(
                F.sequence(F.col("e") + 1, F.lit(ACF_LAGS))
            ).alias("k"),
            "c",
        )
        .groupBy("k")
        .agg(F.sum("c").alias("tl"))
    )
    num, den = _acf_frac("spark")
    return (
        ks.join(p, "k", "left")
        .join(hd, "k", "left")
        .join(tl, "k", "left")
        .fillna({"p": 0, "hd": 0, "tl": 0})
        .selectExpr(
            "k AS lag_hours",
            "n AS n_hours",
            f"CAST({num} AS DOUBLE)"
            f" / CAST(nullif({den}, 0) AS DOUBLE) AS acf",
        )
        .orderBy("lag_hours")
    )


QUERIES = {
    "event_transitions": event_transitions,
    "activity_acf": activity_acf,
}

_ACF_NUM, _ACF_DEN = _acf_frac("duck")

ORACLES = {
    "event_transitions": f"""
        WITH seq AS (
            SELECT user_id, event_type AS to_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS from_type
            FROM events
        ),
        pairs AS (
            SELECT from_type, to_type,
                   CAST(count(*) AS BIGINT) AS n_transitions
            FROM seq WHERE from_type IS NOT NULL
            GROUP BY from_type, to_type
        ),
        totals AS (
            SELECT from_type,
                   CAST(sum(n_transitions) AS BIGINT) AS row_total
            FROM pairs GROUP BY from_type
        )
        SELECT from_type, to_type, n_transitions,
               {halfup_ratio_sql(
                   'n_transitions', 'row_total', TRANSITION_DIGITS, 'duck'
               )} AS p_next
        FROM pairs JOIN totals USING (from_type)
        ORDER BY from_type, to_type
    """,
    "activity_acf": f"""
        WITH counts AS (
            SELECT {_H_FLOOR} AS h,
                   CAST(count(*) AS BIGINT) AS c
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        bounds AS (
            SELECT min(h) AS h0, max(h) AS h1,
                   max(h) - min(h) + 1 AS n,
                   CAST(sum(c) AS BIGINT) AS s,
                   CAST(sum(c * c) AS BIGINT) AS q
            FROM counts
        ),
        ks AS (
            SELECT CAST(g.k AS INT) AS k, n, s, q, h0, h1
            FROM bounds, generate_series(1, {ACF_LAGS}) AS g(k)
        ),
        p AS (
            SELECT CAST(a.h - b.h AS INT) AS k,
                   CAST(sum(a.c * b.c) AS BIGINT) AS p
            FROM counts a JOIN counts b
              ON a.h - b.h BETWEEN 1 AND {ACF_LAGS}
            GROUP BY 1
        ),
        hd AS (
            SELECT ks.k, CAST(sum(c.c) AS BIGINT) AS hd
            FROM ks JOIN counts c ON c.h - ks.h0 < ks.k
            GROUP BY ks.k
        ),
        tl AS (
            SELECT ks.k, CAST(sum(c.c) AS BIGINT) AS tl
            FROM ks JOIN counts c ON ks.h1 - c.h < ks.k
            GROUP BY ks.k
        ),
        assembled AS (
            SELECT ks.k, ks.n, ks.s, ks.q,
                   coalesce(p.p, 0) AS p,
                   coalesce(hd.hd, 0) AS hd,
                   coalesce(tl.tl, 0) AS tl
            FROM ks
            LEFT JOIN p USING (k)
            LEFT JOIN hd USING (k)
            LEFT JOIN tl USING (k)
        )
        SELECT k AS lag_hours, n AS n_hours,
               CAST({_ACF_NUM} AS DOUBLE)
               / CAST(nullif({_ACF_DEN}, 0) AS DOUBLE) AS acf
        FROM assembled
        ORDER BY lag_hours
    """,
}


#: micro-unit scale for the per-group S_g^2/n_g quantization
ANOVA_SCALE = 1_000_000


def activity_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality strength of the observed hourly series: one-way
    ANOVA variance decomposition by hour-of-day and by day-of-week,
    emitting eta^2 = SS_between / SS_total per period — the
    statistic behind "is there a daily/weekly cycle worth modeling"
    (eta^2 ~ 0 means the seasonal-naive forecast adds nothing).

    Exactness: SS_total rides the multiply-through identity
    (n*Q - S^2, exact integers); each group's S_g^2/n_g is half-up
    quantized ONCE to ANOVA_SCALE micro-units (128-bit lift — the
    BM25 per-term discipline; error <= 0.5/SCALE per group, <= 24
    groups) and summed exactly; eta^2 is then ONE shared-text
    double expression over those integers. Day-of-week uses the
    epoch-day + 4 mod 7 rule (day 0 = Thursday), pure integer math
    identical in both engines.

    Scale shape: the corpus collapses to the span-sized hourly
    frame once (shared with activity_acf's aggregate); each period
    is a <=24-row group-by over it plus a 1-row broadcast of the
    corpus moments. Nothing downstream of the first aggregate is
    corpus-sized.
    """
    from ..functions.exact import halfup_div_wide_sql

    counts = (
        load(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(
            F.expr(floordiv_sql("unix_micros(ts)", HOUR_US)).alias("h")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = counts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.expr("sum(c * c)").alias("q"),
    )
    qg = halfup_div_wide_sql(
        f"CAST(sg AS DECIMAL(38,0)) * sg * {ANOVA_SCALE}", "ng"
    )
    qt = halfup_div_wide_sql(
        f"CAST(s AS DECIMAL(38,0)) * s * {ANOVA_SCALE}", "n"
    )

    def one(period: str, grp: str) -> DataFrame:
        groups = (
            counts.withColumn("g", F.expr(grp))
            .groupBy("g")
            .agg(F.sum("c").alias("sg"), F.count(F.lit(1)).alias("ng"))
            .selectExpr(f"{qg} AS qg")
            .agg(
                F.count(F.lit(1)).alias("n_groups"),
                F.sum("qg").alias("sqg"),
            )
        )
        return groups.crossJoin(F.broadcast(tot)).selectExpr(
            f"'{period}' AS period",
            "n AS n_obs",
            "n_groups",
            f"CAST(q * n - s * s AS DOUBLE)"
            f" / CAST(n AS DOUBLE) AS ss_total",
            f"CAST(sqg - {qt} AS DOUBLE)"
            f" / CAST({ANOVA_SCALE} AS DOUBLE) AS ss_between",
            f"(CAST(sqg - {qt} AS DOUBLE)"
            f" / CAST({ANOVA_SCALE} AS DOUBLE))"
            f" / (CAST(q * n - s * s AS DOUBLE) / CAST(n AS DOUBLE))"
            f" AS eta_sq",
        )

    hod = one("hour_of_day", "h % 24")
    dow = one("day_of_week", "((h div 24) + 4) % 7")
    return hod.unionAll(dow).orderBy("period")


QUERIES["activity_anova"] = activity_anova


def _anova_oracle() -> str:
    from ..functions.exact import halfup_div_wide_sql

    qg = halfup_div_wide_sql(
        f"CAST(sg AS HUGEINT) * sg * {ANOVA_SCALE}", "ng", engine="duck"
    )
    qt = halfup_div_wide_sql(
        f"CAST(s AS HUGEINT) * s * {ANOVA_SCALE}", "n", engine="duck"
    )

    def one(period: str, grp: str) -> str:
        return f"""
        SELECT '{period}' AS period,
               n AS n_obs, n_groups,
               CAST(q * n - s * s AS DOUBLE)
                   / CAST(n AS DOUBLE) AS ss_total,
               CAST(sqg - {qt} AS DOUBLE)
                   / CAST({ANOVA_SCALE} AS DOUBLE) AS ss_between,
               (CAST(sqg - {qt} AS DOUBLE)
                   / CAST({ANOVA_SCALE} AS DOUBLE))
                   / (CAST(q * n - s * s AS DOUBLE)
                      / CAST(n AS DOUBLE)) AS eta_sq
        FROM (
            SELECT count(*) AS n_groups,
                   CAST(sum({qg}) AS BIGINT) AS sqg
            FROM (
                SELECT {grp} AS g, CAST(sum(c) AS BIGINT) AS sg,
                       count(*) AS ng
                FROM counts GROUP BY 1
            )
        ), tot"""

    return f"""
        WITH counts AS (
            SELECT {_H_FLOOR} AS h,
                   CAST(count(*) AS BIGINT) AS c
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        tot AS (
            SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
                   CAST(sum(c * c) AS BIGINT) AS q
            FROM counts
        )
        {one("hour_of_day", "h % 24")}
        UNION ALL
        {one("day_of_week", "((h // 24) + 4) % 7")}
        ORDER BY period
    """


ORACLES["activity_anova"] = _anova_oracle()


# -------------------------------------------- Holt forecasting

#: Holt state scale (milli-cents) and the rational smoothing
#: constants: alpha = 1/ALPHA_D, beta = 1/BETA_D — chosen rational so
#: the entire recurrence is EXACT integer arithmetic (no float state
#: drift, no cross-engine transcendental)
HOLT_K = 1000
ALPHA_D = 5
BETA_D = 10


def _fdiv(a: str, d: int, div: str) -> str:
    """Shared-text FLOOR division of a possibly-negative integer:
    subtract the non-negative remainder first, so the division is
    exact and the engines' differing truncation (Spark `div` toward
    zero, DuckDB `//` toward -inf) can never disagree."""
    return f"((({a}) - (((({a}) % {d}) + {d}) % {d})) {div} {d})"


def _holt_step(y: str, l_prev: str, b_prev: str, div: str) -> tuple[str, str]:
    """One Holt update in exact integers: returns (l_t, b_t) SQL.
    l_t = FDIV(y*K + (ALPHA_D-1)*(l+b), ALPHA_D)
    b_t = FDIV((l_t - l) + (BETA_D-1)*b, BETA_D)"""
    lt = _fdiv(
        f"({y}) * {HOLT_K} + {ALPHA_D - 1} * (({l_prev}) + ({b_prev}))",
        ALPHA_D,
        div,
    )
    bt = _fdiv(
        f"({lt}) - ({l_prev}) + {BETA_D - 1} * ({b_prev})", BETA_D, div
    )
    return lt, bt


_DISP = f"CAST({{}} AS DOUBLE) / CAST({HOLT_K * 100} AS DOUBLE)"


def holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing of the daily purchase-
    revenue series (observed days, time order): per day the level,
    trend, and one-step-ahead fit — the last row's `fitted_next` IS
    tomorrow's forecast. alpha=1/5, beta=1/10 are RATIONAL, state is
    integer milli-cents, and every update divides via the shared
    floor-div idiom, so the whole recurrence is exact integer math —
    both engines produce bit-identical state at every step (the
    float-free cousin of the ltv_decay/dsir quantization rule;
    level/trend displays are single IEEE divides of those integers).

    Scale shape: the corpus-sized work is ONE map-side-combinable
    daily aggregate; the inherently-sequential smoothing then folds
    over the DAYS-sized array (bounded by the calendar span, never
    by corpus size) inside one whole-stage `aggregate()` expression
    — JVM-side, no UDF, no driver loop — and explodes back to rows.
    The executor-side collect_list is over that same bounded series
    (the activity_acf family's contract: series length = time span).
    """
    daily = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)").alias(
                "y"
            )
        )
    )
    stype = "struct<day:date,y:bigint,l:bigint,b:bigint>"
    lt, bt = _holt_step(
        "x.y",
        "element_at(acc, -1).l",
        "element_at(acc, -1).b",
        "div",
    )
    fold = f"""
        aggregate(
            sort_array(collect_list(struct(day, y))),
            CAST(array() AS array<{stype}>),
            (acc, x) -> concat(acc, array(CASE WHEN size(acc) = 0
                THEN named_struct(
                    'day', x.day, 'y', x.y,
                    'l', x.y * {HOLT_K}, 'b', CAST(0 AS BIGINT))
                ELSE named_struct(
                    'day', x.day, 'y', x.y,
                    'l', CAST({lt} AS BIGINT),
                    'b', CAST({bt} AS BIGINT))
                END))
        )
    """
    return (
        daily.agg(F.expr(fold).alias("rows"))
        .select(F.explode("rows").alias("r"))
        .selectExpr(
            "r.day AS day",
            "CAST(r.y AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue",
            f"{_DISP.format('r.l')} AS level",
            f"{_DISP.format('r.b')} AS trend",
            f"{_DISP.format('r.l + r.b')} AS fitted_next",
        )
        .orderBy("day")
    )


QUERIES["holt_forecast"] = holt_forecast


def _holt_oracle() -> str:
    lt, bt = _holt_step(
        "(SELECT s FROM ser)[r.i + 1].y", "r.l", "r.b", "//"
    )
    return f"""
        WITH RECURSIVE daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS y
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        ser AS MATERIALIZED (
            SELECT list(struct_pack(day := day, y := y)
                        ORDER BY day) AS s,
                   count(*) AS n
            FROM daily
        ),
        rec(i, day, y, l, b) AS (
            SELECT 1, s[1].day, s[1].y,
                   s[1].y * {HOLT_K}, CAST(0 AS BIGINT)
            FROM ser
            UNION ALL
            SELECT r.i + 1,
                   (SELECT s FROM ser)[r.i + 1].day,
                   (SELECT s FROM ser)[r.i + 1].y,
                   CAST({lt} AS BIGINT),
                   CAST({bt} AS BIGINT)
            FROM rec r
            WHERE r.i < (SELECT n FROM ser)
        )
        SELECT day,
               CAST(y AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
               {_DISP.format('l')} AS level,
               {_DISP.format('b')} AS trend,
               {_DISP.format('l + b')} AS fitted_next
        FROM rec
        ORDER BY day
    """


ORACLES["holt_forecast"] = _holt_oracle()


# ------------------------------------------------ journey trigrams

#: bounded journey-pattern head
TRIGRAM_TOP = 15


def path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRIGRAM_TOP most common 3-step user journeys: consecutive
    event-type triples along each user's (ts, event_id)-ordered
    stream, with their share of all trigrams — the "common paths"
    panel of a product-analytics stack, and the n-gram generalization
    of `event_transitions` (its bigram Markov matrix).

    Scale shape: ONE shuffle on user_id; two lead() windows over the
    same sort produce the triple per row (no self-joins, no arrays),
    then a map-side-combinable count on the bounded |types|^3 key
    space and a 1-row total broadcast. Share is the exact integer
    half-up; the head is fully tiebroken (count desc, steps asc).
    """
    from ..functions.exact import halfup_ratio_sql

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    tri = (
        ev.withColumn("s2", F.lead("event_type", 1).over(w))
        .withColumn("s3", F.lead("event_type", 2).over(w))
        .where(F.col("s3").isNotNull())
        .groupBy(
            F.col("event_type").alias("step1"),
            F.col("s2").alias("step2"),
            F.col("s3").alias("step3"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tri.agg(F.sum("n").alias("t"))
    return (
        tri.crossJoin(F.broadcast(tot))
        .selectExpr(
            "step1",
            "step2",
            "step3",
            "n",
            halfup_ratio_sql("100 * n", "t", 4, "spark")
            + " AS share_pct",
        )
        .orderBy(F.desc("n"), "step1", "step2", "step3")
        .limit(TRIGRAM_TOP)
    )


QUERIES["path_trigrams"] = path_trigrams


def _path_trigrams_oracle() -> str:
    from ..functions.exact import halfup_ratio_sql

    share = halfup_ratio_sql("100 * n", "t", 4, "duck")
    return f"""
        WITH ev AS (
            SELECT user_id, event_type, ts, event_id
            FROM events
        ),
        led AS (
            SELECT event_type AS step1,
                   lead(event_type, 1) OVER w AS step2,
                   lead(event_type, 2) OVER w AS step3
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        tri AS (
            SELECT step1, step2, step3, count(*) AS n
            FROM led WHERE step3 IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM tri)
        SELECT step1, step2, step3, n, {share} AS share_pct
        FROM tri CROSS JOIN tot
        ORDER BY n DESC, step1, step2, step3
        LIMIT {TRIGRAM_TOP}
    """


ORACLES["path_trigrams"] = _path_trigrams_oracle()


def markov_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL-HOLDOUT evaluation of the first-order Markov
    next-event model — the eval-harness shape every pipeline model
    needs and `event_transitions` alone doesn't give: train the
    argmax-next-type predictor on the FIRST HALF of the time range,
    score it on transitions whose source event falls in the second
    half. Answers "does yesterday's transition matrix predict
    tomorrow?" — the drift question, with an exact integer split
    point (midpoint of unix_micros bounds) so both engines carve
    identical halves.

    Determinism: argmax ties break on lexicographic to_type; a
    transition belongs to train/test by its SOURCE event's
    timestamp, so transitions straddling the split are train (the
    model may legitimately see them — their source is history).

    Scale shape: one per-user lag window (uniform key) builds
    transitions once; train aggregate is |types|^2-sized, the argmax
    window runs over that bounded table; the test aggregate joins
    the bounded predictor table broadcast-side.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
    )
    bounds = ev.agg(
        F.expr("(min(us) + max(us)) div 2").alias("mid_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select(
            F.col("event_type").alias("to_type"),
            F.lag("event_type").over(w).alias("from_type"),
            F.lag("us").over(w).alias("from_us"),
        )
        .where(F.col("from_type").isNotNull())
        .crossJoin(F.broadcast(bounds))
    )
    train = (
        seq.where(F.col("from_us") <= F.col("mid_us"))
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wa = Window.partitionBy("from_type").orderBy(
        F.desc("n"), "to_type"
    )
    pred = (
        train.withColumn("rk", F.row_number().over(wa))
        .where("rk = 1")
        .select(
            "from_type",
            F.col("to_type").alias("predicted_next"),
        )
    )
    n_train = train.groupBy("from_type").agg(
        F.sum("n").alias("n_train")
    )
    test = seq.where(F.col("from_us") > F.col("mid_us"))
    scored = (
        test.join(F.broadcast(pred), "from_type")
        .groupBy("from_type", "predicted_next")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                (F.col("to_type") == F.col("predicted_next")).cast(
                    "long"
                )
            ).alias("n_hits"),
        )
    )
    return (
        scored.join(F.broadcast(n_train), "from_type")
        .selectExpr(
            "from_type",
            "n_train",
            "predicted_next",
            "n_test",
            "n_hits",
            f"{halfup_ratio_sql('100 * n_hits', 'n_test', 4, 'spark')}"
            " AS hit_pct",
        )
        .orderBy("from_type")
    )


QUERIES["markov_eval"] = markov_eval

ORACLES["markov_eval"] = f"""
    WITH ev AS (
        SELECT user_id, event_type, ts, event_id,
               epoch_us(ts) AS us
        FROM events
    ),
    bounds AS (
        SELECT (min(us) + max(us)) // 2 AS mid_us FROM ev
    ),
    seq AS (
        SELECT event_type AS to_type,
               lag(event_type) OVER w AS from_type,
               lag(us) OVER w AS from_us
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tr AS (
        SELECT to_type, from_type, from_us
        FROM seq WHERE from_type IS NOT NULL
    ),
    train AS (
        SELECT from_type, to_type, count(*) AS n
        FROM tr WHERE from_us <= (SELECT mid_us FROM bounds)
        GROUP BY 1, 2
    ),
    pred AS (
        SELECT from_type, to_type AS predicted_next
        FROM (
            SELECT from_type, to_type,
                   row_number() OVER (PARTITION BY from_type
                       ORDER BY n DESC, to_type) AS rk
            FROM train
        ) WHERE rk = 1
    ),
    n_train AS (
        SELECT from_type, CAST(sum(n) AS BIGINT) AS n_train
        FROM train GROUP BY from_type
    ),
    scored AS (
        SELECT t.from_type, p.predicted_next,
               CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN t.to_type = p.predicted_next
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        FROM tr t JOIN pred p ON t.from_type = p.from_type
        WHERE t.from_us > (SELECT mid_us FROM bounds)
        GROUP BY 1, 2
    )
    SELECT s.from_type, n.n_train, s.predicted_next, s.n_test,
           s.n_hits,
           {halfup_ratio_sql('100 * s.n_hits', 's.n_test', 4, 'duck')}
               AS hit_pct
    FROM scored s JOIN n_train n ON s.from_type = n.from_type
    ORDER BY s.from_type
"""


# -------------------------------------------- cross-correlation

#: CCF lags emitted (0..K): does series Y follow series X k hours later?
CCF_LAGS = 6

#: the two hourly series crossed — X leads, Y follows
CCF_X_TYPE = "view"
CCF_Y_TYPE = "purchase"


def _ccf_cols(engine: str) -> str:
    """The shared-text CCF expression over exact integer columns
    (nk, p, sx, sxx, sy, syy): Pearson r of the lag-k overlap
    window, numerator and both variance terms lifted to 128-bit
    integers (the activity_acf widening — bigint wraps at corpus
    sizes the 38-digit decimals shrug off), then ONE IEEE divide /
    sqrt on identically-ordered doubles."""
    wide = "DECIMAL(38,0)" if engine == "spark" else "HUGEINT"
    num = f"(CAST(nk AS {wide}) * p - CAST(sx AS {wide}) * sy)"
    vx = f"(CAST(nk AS {wide}) * sxx - CAST(sx AS {wide}) * sx)"
    vy = f"(CAST(nk AS {wide}) * syy - CAST(sy AS {wide}) * sy)"
    return (
        f"CAST({num} AS DOUBLE) / nullif(sqrt(CAST({vx} AS DOUBLE)"
        f" * CAST({vy} AS DOUBLE)), CAST(0 AS DOUBLE))"
    )


def activity_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the hourly '{X}' and '{Y}'
    event-count series: for each lag k = 0..K, the Pearson r between
    x_t and y_(t+k) over the dense corpus hour span — "does purchase
    volume follow view volume k hours later?", the lead-lag
    instrument behind campaign attribution and capacity planning.

    The dense series is never materialized (activity_acf's
    analytic-zeros contract): P_k = Σ x_t·y_(t+k) touches only
    observed-hour pairs via an equi join on the shifted hour key,
    and each lag's overlap-window sums derive from the global sums
    minus boundary folds — the x-side loses its last k hours (tail
    fold), the y-side its first k (head fold), each an
    explode(sequence) over the <=K boundary rows. All sums are
    exact integers (partition-order invariant); the final r is one
    shared-text IEEE expression over 128-bit-lifted terms.

    Scale shape: TWO filtered map-side-combinable hourly aggregates
    are the only corpus-sized work; every downstream frame is
    span-hours- or K-sized. No global window, no dense grid.
    """
    ev = load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    hour = F.expr(floordiv_sql("unix_micros(ts)", HOUR_US))

    def series(t: str):
        return (
            ev.where(F.col("event_type") == t)
            .groupBy(hour.alias("h"))
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint(eager=False)
        )

    xs, ys = series(CCF_X_TYPE), series(CCF_Y_TYPE)
    bounds = (
        ev.agg(
            F.expr(f"min({floordiv_sql('unix_micros(ts)', HOUR_US)})").alias("h0"),
            F.expr(f"max({floordiv_sql('unix_micros(ts)', HOUR_US)})").alias("h1"),
        )
        .withColumn("n", F.col("h1") - F.col("h0") + F.lit(1))
        .localCheckpoint(eager=False)
    )
    tot_x = xs.agg(
        F.sum("c").alias("sxa"), F.expr("sum(c * c)").alias("qxa")
    )
    tot_y = ys.agg(
        F.sum("c").alias("sya"), F.expr("sum(c * c)").alias("qya")
    )
    # P_k: y rows exploded into their K+1 shift sources, equi-joined
    # back onto the x series (observed pairs only)
    shifted = ys.select(
        F.explode(F.sequence(F.lit(0), F.lit(CCF_LAGS))).alias("k"),
        (F.col("h")).alias("ht"),
        F.col("c").alias("cy"),
    ).withColumn("h", F.col("ht") - F.col("k"))
    p = (
        shifted.join(xs.select("h", F.col("c").alias("cx")), "h")
        .groupBy("k")
        .agg(F.expr("sum(cx * cy)").alias("p"))
    )
    b1 = bounds.select("h0", "h1")
    # tail fold of x: hour at offset e from the end leaves the
    # overlap window for every k > e (filter BEFORE sequence —
    # sequence(a, b) with a > b descends instead of emitting empty)
    tx = (
        xs.crossJoin(F.broadcast(b1))
        .withColumn("e", F.col("h1") - F.col("h"))
        .where(F.col("e") < CCF_LAGS)
        .select(
            F.explode(
                F.sequence(F.col("e") + 1, F.lit(CCF_LAGS))
            ).alias("k"),
            "c",
        )
        .groupBy("k")
        .agg(F.sum("c").alias("txs"), F.expr("sum(c * c)").alias("txx"))
    )
    # head fold of y: offset d from the start exits for every k > d
    hy = (
        ys.crossJoin(F.broadcast(b1))
        .withColumn("d", F.col("h") - F.col("h0"))
        .where(F.col("d") < CCF_LAGS)
        .select(
            F.explode(
                F.sequence(F.col("d") + 1, F.lit(CCF_LAGS))
            ).alias("k"),
            "c",
        )
        .groupBy("k")
        .agg(F.sum("c").alias("hys"), F.expr("sum(c * c)").alias("hyy"))
    )
    ks = bounds.crossJoin(F.broadcast(tot_x)).crossJoin(
        F.broadcast(tot_y)
    ).select(
        F.explode(F.sequence(F.lit(0), F.lit(CCF_LAGS))).alias("k"),
        "n",
        "sxa",
        "qxa",
        "sya",
        "qya",
    )
    return (
        ks.join(p, "k", "left")
        .join(tx, "k", "left")
        .join(hy, "k", "left")
        .fillna({"p": 0, "txs": 0, "txx": 0, "hys": 0, "hyy": 0})
        .selectExpr(
            "k",
            "n - k AS nk",
            "p",
            "sxa - txs AS sx",
            "qxa - txx AS sxx",
            "sya - hys AS sy",
            "qya - hyy AS syy",
        )
        .selectExpr(
            "CAST(k AS BIGINT) AS lag_hours",
            "CAST(nk AS BIGINT) AS n_pairs",
            "CAST(p AS BIGINT) AS dot",
            f"{_ccf_cols('spark')} AS ccf",
        )
        .orderBy("lag_hours")
    )


QUERIES["activity_ccf"] = activity_ccf

ORACLES["activity_ccf"] = f"""
    WITH ev AS (
        SELECT {_H_FLOOR} AS h, event_type
        FROM events WHERE ts IS NOT NULL
    ),
    xs AS (
        SELECT h, CAST(count(*) AS BIGINT) AS c FROM ev
        WHERE event_type = '{CCF_X_TYPE}' GROUP BY h
    ),
    ys AS (
        SELECT h, CAST(count(*) AS BIGINT) AS c FROM ev
        WHERE event_type = '{CCF_Y_TYPE}' GROUP BY h
    ),
    bounds AS (
        SELECT min(h) AS h0, max(h) AS h1,
               max(h) - min(h) + 1 AS n
        FROM ev
    ),
    tot AS (
        SELECT (SELECT CAST(sum(c) AS BIGINT) FROM xs) AS sxa,
               (SELECT CAST(sum(c * c) AS BIGINT) FROM xs) AS qxa,
               (SELECT CAST(sum(c) AS BIGINT) FROM ys) AS sya,
               (SELECT CAST(sum(c * c) AS BIGINT) FROM ys) AS qya
    ),
    ks AS (
        SELECT unnest(range(0, {CCF_LAGS} + 1)) AS k
    ),
    p AS (
        SELECT s.k, CAST(sum(x.c * y.c) AS BIGINT) AS p
        FROM ks s
        JOIN ys y ON true
        JOIN xs x ON x.h = y.h - s.k
        GROUP BY s.k
    ),
    tx AS (
        SELECT k, CAST(sum(c) AS BIGINT) AS txs,
               CAST(sum(c * c) AS BIGINT) AS txx
        FROM (
            SELECT unnest(range(b.h1 - x.h + 1, {CCF_LAGS} + 1)) AS k,
                   x.c
            FROM xs x CROSS JOIN bounds b
            WHERE b.h1 - x.h < {CCF_LAGS}
        ) GROUP BY k
    ),
    hy AS (
        SELECT k, CAST(sum(c) AS BIGINT) AS hys,
               CAST(sum(c * c) AS BIGINT) AS hyy
        FROM (
            SELECT unnest(range(y.h - b.h0 + 1, {CCF_LAGS} + 1)) AS k,
                   y.c
            FROM ys y CROSS JOIN bounds b
            WHERE y.h - b.h0 < {CCF_LAGS}
        ) GROUP BY k
    ),
    asm AS (
        SELECT s.k,
               b.n - s.k AS nk,
               COALESCE(p.p, 0) AS p,
               t.sxa - COALESCE(tx.txs, 0) AS sx,
               t.qxa - COALESCE(tx.txx, 0) AS sxx,
               t.sya - COALESCE(hy.hys, 0) AS sy,
               t.qya - COALESCE(hy.hyy, 0) AS syy
        FROM ks s
        CROSS JOIN bounds b
        CROSS JOIN tot t
        LEFT JOIN p ON p.k = s.k
        LEFT JOIN tx ON tx.k = s.k
        LEFT JOIN hy ON hy.k = s.k
    )
    SELECT k AS lag_hours,
           CAST(nk AS BIGINT) AS n_pairs,
           CAST(p AS BIGINT) AS dot,
           {_ccf_cols('duck')} AS ccf
    FROM asm
    ORDER BY lag_hours
"""
