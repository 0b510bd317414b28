"""Moment statistics — the stddev / correlation / regression family,
computed the only way that is reproducible at cluster scale.

Reference scope: the dashboard's per-station value averages
(`streamlit_app.py:273`) stop at AVG; the statistical questions a
warehouse user asks next — spread, association, trend — need second
moments. Spark's builtin `stddev`/`corr`/`regr_slope` accumulate
DOUBLES with a partition-merge update, so their low bits depend on
partition count and task order: the same query returns different
hashes on 8 vs 32 shuffle partitions, and can never match another
engine bit-for-bit. This module is the deterministic twin: aggregate
EXACT INTEGER power sums (n, Σx, Σy, Σx², Σy², Σxy over value cents
and hour-of-day), then evaluate each statistic as ONE identical
IEEE-double expression in both engines. Integer sums are
partition-order invariant, so the result is bit-stable everywhere.

Overflow headroom (data contract: value ≤ ~600.00 → cents ≤ 6·10⁴,
hour ≤ 23): Σx² grows ≤ 3.6·10⁹/row — bigint holds ~2.5·10⁹ rows
per group (≈ sf2500 here); DuckDB errors loudly on bigint overflow
rather than wrapping, so the oracle itself is the canary. Past that,
widen the power sums to DECIMAL(38,0) (`functions/exact.py`'s
documented escape).

Scale: one map-side-combinable groupBy on a 5-value key — the same
single-shuffle shape as any grouped SUM; the double math runs on
5 output rows. A builtin-`corr` plan would shuffle identically but
lose reproducibility; this loses nothing and gains bit-stability.

The final doubles divide/multiply EXACTLY-REPRESENTED integers
(Σx² < 2⁵³ through ~sf100; beyond, both engines round the same
wide value identically), with the expression TEXT shared verbatim
between the Spark query and the DuckDB oracle so the operation
order cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import cents, floordiv_duck, floordiv_sql

#: floor-division hour bucket for the DuckDB oracle (twin of the
#: Spark side's floordiv_sql; see functions/exact.py)
_h_floor = floordiv_duck("epoch_us(CAST(ts AS TIMESTAMP))", 3_600_000_000)
from ..sources.catalog import load

_D = "CAST({} AS DOUBLE)"


def _d(expr: str) -> str:
    return _D.format(expr)

# variance numerators/denominators over the integer power sums —
# shared verbatim by both engines (doubles: IEEE ops on identical
# inputs in identical order are bit-equal everywhere)
_VXN = f"({_d('n')} * {_d('sxx')} - {_d('sx')} * {_d('sx')})"
_VYN = f"({_d('n')} * {_d('syy')} - {_d('sy')} * {_d('sy')})"
_CVN = f"({_d('n')} * {_d('sxy')} - {_d('sx')} * {_d('sy')})"

STAT_EXPRS: dict[str, str] = {
    # value mean in units: one exact divide of integer cents
    "mean_v": f"{_d('sx')} / {_d('n * 100')}",
    "mean_h": f"{_d('sy')} / {_d('n')}",
    # sample stddev of value (cents → units via /100)
    "stddev_samp_v": (
        f"CASE WHEN n > 1 THEN"
        f" sqrt({_VXN} / ({_d('n')} * {_d('n - 1')}))"
        f" / {_d('100')} ELSE NULL END"
    ),
    "stddev_samp_h": (
        f"CASE WHEN n > 1 THEN"
        f" sqrt({_VYN} / ({_d('n')} * {_d('n - 1')}))"
        f" ELSE NULL END"
    ),
    # Pearson correlation — scale factors cancel, so cents vs units
    # is immaterial; guarded against zero variance on either side
    "corr_vh": (
        f"CASE WHEN n > 1 AND {_VXN} > 0 AND {_VYN} > 0 THEN"
        f" {_CVN} / (sqrt({_VXN}) * sqrt({_VYN}))"
        f" ELSE NULL END"
    ),
    # OLS of value (units) on hour: slope, then intercept through
    # the means — same moments, no second pass
    "slope_vh": (
        f"CASE WHEN {_VYN} > 0 THEN"
        f" {_CVN} / {_VYN} / {_d('100')} ELSE NULL END"
    ),
    "intercept_vh": (
        f"CASE WHEN {_VYN} > 0 THEN"
        f" {_d('sx')} / {_d('n * 100')}"
        f" - {_CVN} / {_VYN} / {_d('100')} * ({_d('sy')} / {_d('n')})"
        f" ELSE NULL END"
    ),
}

_FINAL = ["event_type", "n", "sx", "sy", "sxx", "syy", "sxy"] + [
    f"{sql} AS {name}" for name, sql in STAT_EXPRS.items()
]


def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: exact integer power sums of (value cents,
    hour-of-day) plus mean / sample stddev / Pearson corr / OLS
    slope+intercept, each one shared-text double expression."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        cents(F.col("value")).alias("x"),
        F.hour("ts").cast("long").alias("y"),
    )
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return sums.selectExpr(*_FINAL).orderBy("event_type")


QUERIES = {"stats_moments": stats_moments}

ORACLES = {
    "stats_moments": f"""
        WITH e AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS x,
                   CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS y
            FROM events
        ),
        sums AS (
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM e GROUP BY event_type
        )
        SELECT {', '.join(_FINAL)}
        FROM sums
        ORDER BY event_type
    """,
}


#: robust outlier threshold: |v - med| > ROBUST_K * 1.4826 * MAD,
#: with the normal-consistency constant as the exact rational
#: 14826/10000 so the comparison clears to pure integers
ROBUST_K = 3
MAD_SIGMA_N, MAD_SIGMA_D = 14826, 10000


def robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: exact median, exact MAD, and the count of
    robust outliers (|v - median| > K * 1.4826 * MAD) over value
    cents — the moment family's heavy-tail-safe sibling (a z-score
    on stats_moments' stddev breaks down when outliers inflate the
    stddev itself; the MAD rule is the standard robust form).

    EXACT medians, distributively: the per-type VALUE HISTOGRAM
    (type, cents, count) is the shuffled state — bounded by the
    value domain (a 2-decimal price range), never by row count, so
    a reducer holds ~10^4-10^6 integers per type at any corpus
    size. Both middle order statistics come from the histogram's
    cumulative counts with pure-integer ranks ((n+1) div 2 and
    n div 2 + 1 — the grid_quantiles rational-rank lesson), and the
    doubled medians M = v_lo + v_hi / M_A = a_lo + a_hi stay
    integers, so the outlier test

        |v - M/2| > K * (14826/10000) * (M_A / 4)

    clears to  2*10^4 * |2v - M|  >  K * 14826 * M_A  — exact. The
    deviation histogram reuses the value histogram (|2v - M| folds
    values; counts re-aggregate), and displayed median/mad/sigma
    are single IEEE divides of integers.
    """
    from pyspark.sql import Window

    from ..functions.exact import halfup_ratio_sql

    hist = (
        load(spark, sf_dir, "events")
        .select("event_type", cents(F.col("value")).alias("v"))
        .groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )

    def _doubled_median(h: DataFrame, col: str) -> DataFrame:
        """(event_type, m, n): m = lo+hi middle order stats of the
        histogram (h must have event_type, col, cnt)."""
        w = Window.partitionBy("event_type").orderBy(col)
        c = h.withColumn("cum", F.sum("cnt").over(w)).withColumn(
            "n", F.sum("cnt").over(Window.partitionBy("event_type"))
        )
        return c.groupBy("event_type").agg(
            (
                F.min(
                    F.when(
                        F.expr("cum >= (n + 1) div 2"), F.col(col)
                    )
                )
                + F.min(
                    F.when(F.expr("cum >= n div 2 + 1"), F.col(col))
                )
            ).alias("m"),
            F.max("n").alias("n"),
        )

    med = _doubled_median(hist, "v")
    a_hist = (
        hist.join(
            F.broadcast(med.select("event_type", "m")), "event_type"
        )
        .select(
            "event_type",
            F.abs(F.lit(2) * F.col("v") - F.col("m")).alias("a"),
            "cnt",
        )
        .groupBy("event_type", "a")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    mad = _doubled_median(a_hist, "a").select(
        "event_type", F.col("m").alias("ma")
    )
    thresh = ROBUST_K * MAD_SIGMA_N
    out = (
        a_hist.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.expr(f"2 * {MAD_SIGMA_D} * a > {thresh} * ma"),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("n_outliers")
        )
    )
    return (
        med.join(mad, "event_type")
        .join(out, "event_type")
        .selectExpr(
            "event_type",
            "n",
            "CAST(m AS DOUBLE) / CAST(200 AS DOUBLE) AS median_value",
            "CAST(ma AS DOUBLE) / CAST(400 AS DOUBLE) AS mad_value",
            f"CAST({MAD_SIGMA_N} * ma AS DOUBLE)"
            f" / CAST({400 * MAD_SIGMA_D} AS DOUBLE) AS robust_sigma",
            "n_outliers",
            f"{halfup_ratio_sql('100 * n_outliers', 'n', 4, 'spark')}"
            " AS outlier_pct",
        )
        .orderBy("event_type")
    )


QUERIES["robust_outliers"] = robust_outliers


def _robust_oracle() -> str:
    from ..functions.exact import halfup_ratio_sql

    def doubled_median(src: str, col: str, alias: str) -> str:
        return f"""
        {alias}_c AS (
            SELECT event_type, {col}, cnt,
                   CAST(sum(cnt) OVER (
                       PARTITION BY event_type ORDER BY {col}
                   ) AS BIGINT) AS cum,
                   CAST(sum(cnt) OVER (
                       PARTITION BY event_type
                   ) AS BIGINT) AS n
            FROM {src}
        ),
        {alias} AS (
            SELECT event_type,
                   min(CASE WHEN cum >= (n + 1) // 2
                            THEN {col} END)
                   + min(CASE WHEN cum >= n // 2 + 1
                              THEN {col} END) AS m,
                   max(n) AS n
            FROM {alias}_c GROUP BY event_type
        )"""

    thresh = ROBUST_K * MAD_SIGMA_N
    return f"""
        WITH hist AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        {doubled_median('hist', 'v', 'med')},
        a_hist AS (
            SELECT h.event_type, abs(2 * h.v - med.m) AS a,
                   CAST(sum(h.cnt) AS BIGINT) AS cnt
            FROM hist h JOIN med USING (event_type)
            GROUP BY 1, 2
        ),
        {doubled_median('a_hist', 'a', 'madm')},
        outl AS (
            SELECT a.event_type,
                   CAST(sum(CASE WHEN 2 * {MAD_SIGMA_D} * a.a
                                      > {thresh} * madm.m
                                 THEN a.cnt ELSE 0 END)
                        AS BIGINT) AS n_outliers
            FROM a_hist a JOIN madm USING (event_type)
            GROUP BY 1
        )
        SELECT med.event_type AS event_type, med.n AS n,
               CAST(med.m AS DOUBLE) / CAST(200 AS DOUBLE)
                   AS median_value,
               CAST(madm.m AS DOUBLE) / CAST(400 AS DOUBLE)
                   AS mad_value,
               CAST({MAD_SIGMA_N} * madm.m AS DOUBLE)
                   / CAST({400 * MAD_SIGMA_D} AS DOUBLE)
                   AS robust_sigma,
               n_outliers,
               {halfup_ratio_sql('100 * n_outliers', 'med.n', 4, 'duck')}
                   AS outlier_pct
        FROM med JOIN madm USING (event_type)
        JOIN outl USING (event_type)
        ORDER BY event_type
    """


ORACLES["robust_outliers"] = _robust_oracle()


def benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of purchase amounts — the
    standard forensic screen for fabricated numbers: per leading
    digit 1-9, the observed count and share vs the Benford
    expectation log10(1+1/d), plus the standardized residual
    (o - e)/sqrt(e(1-p)) that flags which digits drift.

    Exactness: the digit is string-extracted from the exact integer
    cents (both engines materialize the same digits for positive
    bigints — no float log10 on the value side); counts are exact
    integers; expectation and residual are shared-text IEEE
    expressions over (n_total, n_d) and the Benford constant
    log10(1+1/d) computed identically in both engines. Per-digit
    rows avoid any order-dependent double aggregation (a scalar
    chi-square would sum 9 doubles in engine-dependent order).

    Scale shape: one projection + one <=9-group map-side-combinable
    aggregate + a 1-row total broadcast. Zero-amount purchases are
    excluded (no leading digit).
    """
    from ..functions.exact import cents, halfup_ratio_sql

    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(cents(F.col("value")).alias("c"))
        .where(F.col("c") > 0)
        .select(
            F.expr("CAST(substring(CAST(c AS STRING), 1, 1) AS INT)").alias(
                "digit"
            )
        )
    )
    per = ev.groupBy("digit").agg(F.count(F.lit(1)).alias("n_d"))
    tot = per.agg(F.sum("n_d").alias("n_total"))
    p = "log10(1.0 + 1.0 / CAST(digit AS DOUBLE))"
    resid = (
        f"(CAST(n_d AS DOUBLE) - CAST(n_total AS DOUBLE) * {p})"
        f" / sqrt(CAST(n_total AS DOUBLE) * {p} * (1.0 - {p}))"
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "digit",
            "n_d",
            halfup_ratio_sql("100 * n_d", "n_total", 4, "spark")
            + " AS observed_pct",
            f"{p} * 100.0 AS benford_pct",
            f"{resid} AS z_resid",
        )
        .orderBy("digit")
    )


QUERIES["benford_digits"] = benford_digits


def _benford_oracle() -> str:
    from ..functions.exact import halfup_ratio_sql

    p = "log10(1.0 + 1.0 / CAST(digit AS DOUBLE))"
    resid = (
        f"(CAST(n_d AS DOUBLE) - CAST(n_total AS DOUBLE) * {p})"
        f" / sqrt(CAST(n_total AS DOUBLE) * {p} * (1.0 - {p}))"
    )
    return f"""
        WITH c AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS c
            FROM events WHERE event_type = 'purchase'
        ),
        d AS (
            SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS INT)
                       AS digit
            FROM c WHERE c > 0
        ),
        per AS (SELECT digit, count(*) AS n_d FROM d GROUP BY digit),
        tot AS (SELECT CAST(sum(n_d) AS BIGINT) AS n_total FROM per)
        SELECT digit, n_d,
               {halfup_ratio_sql('100 * n_d', 'n_total', 4, 'duck')}
                   AS observed_pct,
               {p} * 100.0 AS benford_pct,
               {resid} AS z_resid
        FROM per CROSS JOIN tot
        ORDER BY digit
    """


ORACLES["benford_digits"] = _benford_oracle()


def metric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between the event types' hourly
    volumes — the cross-metric panel ("do errors spike when traffic
    does?") that turns five separate time series into a dependency
    map. Emits one row per unordered type pair over the DENSE hour
    grid (a missing (hour, type) cell is a genuine zero, and
    leaving it out would bias every correlation upward).

    Exactness: the dense grid is the (bounded) hour spine crossed
    with the type domain, zero-filled; per-pair power sums are
    exact integer sums, and each correlation is ONE shared-text
    IEEE expression (the stats_moments discipline — bit-equal
    everywhere, partition-order-free).

    Scale shape: one corpus aggregate to the (hour, type) table;
    the spine explode, the dense fill, and the |types|^2-fanout
    self-join all run on calendar-bounded frames.
    """
    ev = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.expr(floordiv_sql("unix_micros(ts)", 3_600_000_000)).alias("h"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    bounds = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    types = ev.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1)")).alias("h"),
        )
    )
    dense = (
        spine.join(ev, ["event_type", "h"], "left")
        .select(
            "h",
            "event_type",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    a = dense.select(
        "h", F.col("event_type").alias("t1"), F.col("c").alias("x")
    )
    b = dense.select(
        "h", F.col("event_type").alias("t2"), F.col("c").alias("y")
    )
    sums = (
        a.join(b, "h")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x * x")).alias("sxx"),
            F.sum(F.expr("y * y")).alias("syy"),
            F.sum(F.expr("x * y")).alias("sxy"),
        )
    )
    return sums.selectExpr(
        "t1", "t2", "n", STAT_EXPRS["corr_vh"] + " AS corr"
    ).orderBy("t1", "t2")


QUERIES["metric_correlations"] = metric_correlations

ORACLES["metric_correlations"] = f"""
    WITH ev AS (
        SELECT {_h_floor} AS h,
               event_type, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
    types AS (SELECT DISTINCT event_type FROM ev),
    spine AS (
        SELECT event_type, CAST(unnest(range(h0, h1 + 1)) AS BIGINT)
                   AS h
        FROM types, bounds
    ),
    dense AS (
        SELECT spine.h, spine.event_type,
               CAST(coalesce(ev.c, 0) AS BIGINT) AS c
        FROM spine LEFT JOIN ev
          ON ev.event_type = spine.event_type AND ev.h = spine.h
    ),
    sums AS (
        SELECT a.event_type AS t1, b.event_type AS t2,
               count(*) AS n,
               CAST(sum(a.c) AS BIGINT) AS sx,
               CAST(sum(b.c) AS BIGINT) AS sy,
               CAST(sum(a.c * a.c) AS BIGINT) AS sxx,
               CAST(sum(b.c * b.c) AS BIGINT) AS syy,
               CAST(sum(a.c * b.c) AS BIGINT) AS sxy
        FROM dense a JOIN dense b
          ON a.h = b.h AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT t1, t2, n, {STAT_EXPRS['corr_vh']} AS corr
    FROM sums
    ORDER BY t1, t2
"""


#: winsorization tail share, percent each side
WINSOR_PCT = 5


def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type WINSORIZED mean — the robust location estimate that
    keeps every observation but clamps the tails (vs the median's
    total order and the trimmed mean's data loss): values below the
    p{WINSOR_PCT} cut rise to it, values above p{100 - WINSOR_PCT}
    fall to it, then a plain mean. The de-facto aggregation for
    heavy-tailed metrics (payment values, latencies) where a handful
    of outliers otherwise own the average.

    Exactness: the cuts are ceil-rank order statistics over the
    VALUE HISTOGRAM (integer cents, cumulative counts over distinct
    values — the robust_outliers idiom, never a per-row global
    sort); the clamped sum accumulates DECIMAL(38,0) (cents x 100-TB
    row counts pass BIGINT around sf30k) and displays through the
    128-bit half-up. The only doubles are the /100 display of the
    integer cut values.

    Scale shape: one scan -> (type, cent-value) histogram -> window
    over DISTINCT values per type -> bounded per-type aggregate.
    """
    from ..functions.exact import halfup_ratio_wide_sql

    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hist = ev.groupBy(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    wv = Window.partitionBy("event_type").orderBy("v")
    wall = Window.partitionBy("event_type")
    c = hist.withColumn("cum", F.sum("cnt").over(wv)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    lo_rank = f"({WINSOR_PCT} * n + 99) div 100"
    hi_rank = f"({100 - WINSOR_PCT} * n + 99) div 100"
    cuts = c.groupBy("event_type").agg(
        F.expr(f"min(CASE WHEN cum >= {lo_rank} THEN v END)").alias("lo"),
        F.expr(f"min(CASE WHEN cum >= {hi_rank} THEN v END)").alias("hi"),
        F.max("n").alias("n"),
    )
    ws = (
        hist.join(cuts, "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                (
                    F.greatest("lo", F.least(F.col("v"), F.col("hi")))
                    * F.col("cnt")
                ).cast("decimal(38,0)")
            ).alias("wsum"),
            F.max("n").alias("n"),
            F.max("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )
    )
    return ws.selectExpr(
        "event_type",
        "n",
        "CAST(lo AS DOUBLE) / CAST(100 AS DOUBLE) AS lo_cut",
        "CAST(hi AS DOUBLE) / CAST(100 AS DOUBLE) AS hi_cut",
        f"{halfup_ratio_wide_sql('wsum', '100 * n', 4, 'spark')}"
        " AS winsorized_mean",
    ).orderBy("event_type")


QUERIES["winsorized_stats"] = winsorized_stats


def _winsorized_oracle() -> str:
    from ..functions.exact import halfup_ratio_wide_sql

    lo_rank = f"({WINSOR_PCT} * n + 99) // 100"
    hi_rank = f"({100 - WINSOR_PCT} * n + 99) // 100"
    return f"""
        WITH hist AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        c AS (
            SELECT event_type, v, cnt,
                   CAST(sum(cnt) OVER (PARTITION BY event_type
                       ORDER BY v) AS BIGINT) AS cum,
                   CAST(sum(cnt) OVER (PARTITION BY event_type)
                       AS BIGINT) AS n
            FROM hist
        ),
        cuts AS (
            SELECT event_type,
                   min(CASE WHEN cum >= {lo_rank} THEN v END) AS lo,
                   min(CASE WHEN cum >= {hi_rank} THEN v END) AS hi,
                   max(n) AS n
            FROM c GROUP BY event_type
        ),
        ws AS (
            SELECT h.event_type,
                   CAST(sum(CAST(greatest(lo, least(h.v, hi)) AS HUGEINT)
                       * h.cnt) AS HUGEINT) AS wsum,
                   max(n) AS n, max(lo) AS lo, max(hi) AS hi
            FROM hist h JOIN cuts USING (event_type)
            GROUP BY h.event_type
        )
        SELECT event_type, n,
               CAST(lo AS DOUBLE) / CAST(100 AS DOUBLE) AS lo_cut,
               CAST(hi AS DOUBLE) / CAST(100 AS DOUBLE) AS hi_cut,
               {halfup_ratio_wide_sql('wsum', '100 * n', 4, 'duck')}
                   AS winsorized_mean
        FROM ws
        ORDER BY event_type
    """


ORACLES["winsorized_stats"] = _winsorized_oracle()


# -------------------------------------------- Theil-Sen robust trend

#: quantization of a pair slope to milli-cents/day: SIGNED half-up
#: of (1000 * dy) / dx — each pair quantized ONCE, the comparison
#: key is then a pure integer (the ltv_decay/bm25 one-quantization
#: rule applied to a rational)
def _ts_slope_m(dy: str, dx: str, engine: str) -> str:
    div = "div" if engine == "spark" else "//"
    return (
        f"((CASE WHEN ({dy}) < 0 THEN -1 ELSE 1 END)"
        f" * ((abs({dy}) * 2000 + ({dx})) {div} (({dx}) * 2)))"
    )


def theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily purchase-revenue series —
    the median of all pairwise slopes, the estimator that shrugs off
    the outlier days that drag OLS around (breakdown point ~29%) —
    reported next to the OLS slope so the gap itself is the outlier
    signal.

    Exactness: each pair's slope is quantized ONCE to integer
    milli-cents/day via the signed half-up; the median is then an
    integer ORDER STATISTIC under the total order (slope_m, i, j) —
    no float comparisons anywhere, the lower median for even counts.
    The OLS slope rides exact integer power sums lifted to 128 bits
    (the stats_moments discipline) with ONE shared-text IEEE divide.

    Scale shape: the corpus-sized work is ONE map-side-combinable
    daily aggregate; the pair table is DAYS^2-bounded — bounded by
    the calendar span squared, never by corpus size (the
    holt_forecast series contract; ~5*10^6 pairs even for a decade
    of days). Its rank window is over that bounded frame, the same
    domain-sized-total-order exemption the exit-day histogram and
    value-grid order statistics use."""
    daily = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.expr(
                "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            ).alias("y")
        )
        .localCheckpoint(eager=False)
    )
    base = daily.agg(F.min("day").alias("d0"))
    pts = daily.crossJoin(F.broadcast(base)).selectExpr(
        "CAST(datediff(day, d0) AS BIGINT) AS x", "y"
    ).localCheckpoint(eager=False)
    a = pts.selectExpr("x AS xi", "y AS yi")
    b = pts.selectExpr("x AS xj", "y AS yj")
    pairs = a.join(b, F.col("xi") < F.col("xj")).selectExpr(
        "xi",
        "xj",
        f"{_ts_slope_m('yj - yi', 'xj - xi', 'spark')} AS s_m",
    )
    w = Window.partitionBy(F.lit(1)).orderBy("s_m", "xi", "xj")
    med = (
        pairs.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "p", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
        )
        .where("rn = (p + 1) div 2")
        .selectExpr("s_m AS ts_slope_mcents", "p AS n_pairs")
    )
    ols = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.expr("sum(x * x)").alias("sxx"),
        F.expr("sum(x * y)").alias("sxy"),
    )
    wide = "DECIMAL(38,0)"
    ols_num = f"(CAST(n AS {wide}) * sxy - CAST(sx AS {wide}) * sy)"
    ols_den = f"(CAST(n AS {wide}) * sxx - CAST(sx AS {wide}) * sx)"
    return (
        med.crossJoin(F.broadcast(ols))
        .selectExpr(
            "n AS n_days",
            "n_pairs",
            "ts_slope_mcents",
            "CAST(ts_slope_mcents AS DOUBLE)"
            " / CAST(100000 AS DOUBLE) AS ts_slope",
            f"CAST({ols_num} AS DOUBLE)"
            f" / (CAST({ols_den} AS DOUBLE)"
            " * CAST(100 AS DOUBLE)) AS ols_slope",
        )
    )


QUERIES["theilsen_trend"] = theilsen_trend


def _theilsen_oracle() -> str:
    wide = "HUGEINT"
    ols_num = f"(CAST(n AS {wide}) * sxy - CAST(sx AS {wide}) * sy)"
    ols_den = f"(CAST(n AS {wide}) * sxx - CAST(sx AS {wide}) * sx)"
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS y
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        pts AS (
            SELECT CAST(datediff('day',
                       (SELECT min(day) FROM daily), day)
                       AS BIGINT) AS x, y
            FROM daily
        ),
        pairs AS (
            SELECT a.x AS xi, b.x AS xj,
                   {_ts_slope_m('b.y - a.y', 'b.x - a.x', 'duck')}
                       AS s_m
            FROM pts a JOIN pts b ON a.x < b.x
        ),
        med AS (
            SELECT s_m AS ts_slope_mcents, p AS n_pairs FROM (
                SELECT s_m,
                       row_number() OVER (ORDER BY s_m, xi, xj) AS rn,
                       count(*) OVER () AS p
                FROM pairs
            ) WHERE rn = (p + 1) // 2
        ),
        ols AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM pts
        )
        SELECT n AS n_days,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               CAST(ts_slope_mcents AS BIGINT) AS ts_slope_mcents,
               CAST(ts_slope_mcents AS DOUBLE)
                   / CAST(100000 AS DOUBLE) AS ts_slope,
               CAST({ols_num} AS DOUBLE)
                   / (CAST({ols_den} AS DOUBLE)
                      * CAST(100 AS DOUBLE)) AS ols_slope
        FROM med, ols
    """


ORACLES["theilsen_trend"] = _theilsen_oracle()
