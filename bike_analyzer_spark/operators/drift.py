"""Distribution-shift diagnostics over the events stream — CUSUM
changepoint detection on the hourly series and the Population
Stability Index (PSI) between the first and second half of the
observation window.

Reference scope: the reference's dashboards assume a stationary
feed; a pipeline retraining models on rolling data needs to know
WHEN the input distribution moved (CUSUM localizes the shift hour)
and BY HOW MUCH the categorical mix drifted (PSI is the industry
threshold metric — <0.1 stable, >0.25 shifted). Both instruments
follow `divergence.py`'s integer discipline.

Exactness:
* CUSUM: with m = S/n the dense-series mean, the statistic
  S_t = sum_{i<=t}(c_i - m) multiplied through by n is
  n*S_t = n*P_t - t*S — exact integers (P_t = dense prefix sum).
  Zero hours change S_t linearly, so on any unobserved gap the
  extremum sits at a gap ENDPOINT: the candidate set "every
  observed hour + the position just before each observed hour"
  covers the dense argmax without materializing the grid. The
  argmax of |n*S_t| (tie: earliest) is exact; displayed values are
  single divisions / half-up ratios of integers.
* PSI: with half totals T1, T2 and per-bucket counts f, g,
  (p-q)*ln(p/q) = (f*T2 - g*T1) * (L(f*T2) - L(g*T1))
                  / (T1*T2*1e6)
  where L(x) = round(ln(x)*1e6) is quantized ONCE per integer
  product (the divergence.py ratio trick — ln of a RATIO of
  integers needs no division), so per-bucket contributions and
  their sum are exact integers over a shared 128-bit lift; each
  display is one IEEE divide. Buckets empty in either half are
  excluded (ln 0 — the standard "co-occurring buckets" PSI form),
  identically in both engines.

Overflow headroom: the PSI integrand (f*T2 - g*T1)*dL carries
~T^2*ln(T)*1e6 — bigint wraps near T ~ 10^4 events per half, so
the lift runs in Spark DECIMAL(38,0) / DuckDB HUGEINT from the
start (safe through T ~ 3*10^12). CUSUM's n*P_t is bigint-safe to
n*S ~ 9*10^18 (a century of hours at ~10^10 events/hour); its
displayed ratios ride the wide half-up helpers.

Scale shape: both queries reduce the corpus to bounded frames in
ONE shuffle (the hourly aggregate, span-sized; the type-by-half
aggregate, |types|*2 rows). CUSUM's prefix sum is a single global
window over the TIME-bounded hourly series (the cohort-triangle
allowance — never corpus-sized); everything after is span-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import (
    floordiv_duck,
    floordiv_sql,
    halfup_ratio_wide_sql,
)
from ..sources.catalog import load

#: micro-nat quantizer — shared text, applied ONCE per transcendental
_L = "CAST(round(ln(CAST({} AS DOUBLE)) * 1000000) AS BIGINT)"

#: microseconds per hour (gapfill.py's integer hour index)
HOUR_US = 3_600_000_000

#: floor-division hour bucket for the DuckDB oracles — the twin of
#: the Spark side's floordiv_sql (both are mathematical floor; the
#: engines' raw div/// both truncate, see functions/exact.py)
_H_FLOOR = floordiv_duck("epoch_us(CAST(ts AS TIMESTAMP))", HOUR_US)


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(F.expr(floordiv_sql("unix_micros(ts)", HOUR_US)).alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hour where the cumulative deviation from the global mean
    peaks — the CUSUM changepoint estimate — with the before/after
    mean rates quantifying the level shift."""
    counts = _hourly(spark, sf_dir).localCheckpoint(eager=False)
    bounds = counts.agg(
        F.min("h").alias("h0"),
        (F.max("h") - F.min("h") + F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
    )
    pref = counts.withColumn(
        "p", F.sum("c").over(Window.orderBy("h"))
    )
    base = pref.crossJoin(F.broadcast(bounds))
    # candidate A: this observed hour; candidate B: the dense
    # position just before it (the other end of any preceding gap)
    cand_a = base.selectExpr("h - h0 + 1 AS pos", "p", "n", "s", "h0")
    cand_b = base.selectExpr(
        "h - h0 AS pos", "p - c AS p", "n", "s", "h0"
    ).where(F.col("pos") >= 1)
    cands = cand_a.unionAll(cand_b).withColumn(
        "ns", F.expr("n * p - pos * s")
    )
    top = (
        cands.orderBy(F.abs(F.col("ns")).desc(), F.asc("pos"))
        .limit(1)
    )
    mean_b = halfup_ratio_wide_sql("p", "pos", 4, "spark")
    mean_a = halfup_ratio_wide_sql("s - p", "n - pos", 4, "spark")
    return top.selectExpr(
        f"timestamp_micros((h0 + pos - 1) * {HOUR_US}) AS change_ts",
        "pos AS change_pos",
        "n AS n_hours",
        "CAST(ns AS DOUBLE) / CAST(n AS DOUBLE) AS cusum",
        f"{mean_b} AS mean_rate_before",
        f"CASE WHEN n > pos THEN {mean_a}"
        f" ELSE CAST(0 AS DOUBLE) END AS mean_rate_after",
    )


def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of the event-type mix, first half vs second half of the
    observation window (split at the midpoint hour). Per-bucket
    contributions plus an '(all)' total row."""
    ev = load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    hb = ev.select(
        "event_type",
        F.expr(floordiv_sql("unix_micros(ts)", HOUR_US)).alias("h"),
    )
    lim = hb.agg(
        # first half: h <= mid where mid splits [h0, h1] evenly
        F.expr("(min(h) + max(h) - 1) div 2").alias("mid")
    )
    halves = (
        hb.crossJoin(F.broadcast(lim))
        .groupBy(
            "event_type",
            (F.col("h") <= F.col("mid")).alias("first_half"),
        )
        .agg(F.count(F.lit(1)).alias("f"))
    )
    wide = (
        halves.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("first_half"), F.col("f"))).alias("f1"),
            F.sum(
                F.when(~F.col("first_half"), F.col("f"))
            ).alias("f2"),
        )
        .where(F.col("f1").isNotNull() & F.col("f2").isNotNull())
    )
    return psi_table(wide)


def psi_table(wide: DataFrame) -> DataFrame:
    """PSI report over a (event_type, f1, f2) count frame: per-bucket
    contributions plus the '(all)' total — the reusable core behind
    `psi_drift` (first vs second half) and the streaming monitor
    (`streaming.driftserve`: frozen baseline vs each micro-batch).
    Caller guarantees f1 > 0 and f2 > 0 (co-occurring buckets)."""
    tot = wide.agg(
        F.sum("f1").alias("t1"), F.sum("f2").alias("t2")
    )
    per = (
        wide.crossJoin(F.broadcast(tot))
        .withColumn(
            "contrib_u",
            F.expr(
                "(CAST(f1 AS DECIMAL(38,0)) * t2"
                " - CAST(f2 AS DECIMAL(38,0)) * t1)"
                f" * ({_L.format('f1 * CAST(t2 AS DECIMAL(38,0))')}"
                f" - {_L.format('f2 * CAST(t1 AS DECIMAL(38,0))')})"
            ),
        )
        .localCheckpoint(eager=False)
    )
    show = (
        "CAST(contrib_u AS DOUBLE) / (CAST(t1 AS DOUBLE)"
        " * CAST(t2 AS DOUBLE) * CAST(1000000 AS DOUBLE))"
    )
    rows = per.selectExpr(
        "event_type",
        "f1 AS n_first",
        "f2 AS n_second",
        f"{halfup_ratio_wide_sql('f1', 't1', 4, 'spark')} AS p_first",
        f"{halfup_ratio_wide_sql('f2', 't2', 4, 'spark')} AS p_second",
        f"{show} AS psi_contrib",
    )
    total = (
        per.groupBy("t1", "t2")
        .agg(
            F.sum("f1").alias("f1"),
            F.sum("f2").alias("f2"),
            F.sum("contrib_u").alias("contrib_u"),
        )
        .selectExpr(
            "'(all)' AS event_type",
            "f1 AS n_first",
            "f2 AS n_second",
            f"{halfup_ratio_wide_sql('f1', 't1', 4, 'spark')} AS p_first",
            f"{halfup_ratio_wide_sql('f2', 't2', 4, 'spark')}"
            " AS p_second",
            f"{show} AS psi_contrib",
        )
    )
    return rows.unionAll(total).orderBy("event_type")


QUERIES = {
    "cusum_changepoint": cusum_changepoint,
    "psi_drift": psi_drift,
}

_CUSUM_MEAN_B = halfup_ratio_wide_sql("p", "pos", 4, "duck")
_CUSUM_MEAN_A = halfup_ratio_wide_sql("s - p", "n - pos", 4, "duck")

ORACLES = {
    "cusum_changepoint": f"""
        WITH counts AS (
            SELECT {_H_FLOOR} AS h,
                   CAST(count(*) AS BIGINT) AS c
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        bounds AS (
            SELECT min(h) AS h0, max(h) - min(h) + 1 AS n,
                   CAST(sum(c) AS BIGINT) AS s
            FROM counts
        ),
        pref AS (
            SELECT h, c,
                   CAST(sum(c) OVER (ORDER BY h) AS BIGINT) AS p
            FROM counts
        ),
        base AS (SELECT * FROM pref, bounds),
        cands AS (
            SELECT h - h0 + 1 AS pos, p, n, s, h0 FROM base
            UNION ALL
            SELECT h - h0 AS pos, p - c AS p, n, s, h0 FROM base
            WHERE h - h0 >= 1
        ),
        scored AS (
            SELECT *, n * p - pos * s AS ns FROM cands
        ),
        top AS (
            SELECT * FROM scored
            ORDER BY abs(ns) DESC, pos ASC LIMIT 1
        )
        SELECT make_timestamp((h0 + pos - 1) * {HOUR_US}) AS change_ts,
               pos AS change_pos,
               n AS n_hours,
               CAST(ns AS DOUBLE) / CAST(n AS DOUBLE) AS cusum,
               {_CUSUM_MEAN_B} AS mean_rate_before,
               CASE WHEN n > pos THEN {_CUSUM_MEAN_A}
                    ELSE CAST(0 AS DOUBLE) END AS mean_rate_after
        FROM top
    """,
    "psi_drift": f"""
        WITH hb AS (
            SELECT event_type, {_H_FLOOR} AS h
            FROM events WHERE ts IS NOT NULL
        ),
        lim AS (
            SELECT (min(h) + max(h) - 1) // 2 AS mid FROM hb
        ),
        halves AS (
            SELECT event_type, h <= mid AS first_half,
                   CAST(count(*) AS BIGINT) AS f
            FROM hb, lim GROUP BY 1, 2
        ),
        wide AS (
            SELECT event_type,
                   CAST(sum(CASE WHEN first_half THEN f END)
                        AS BIGINT) AS f1,
                   CAST(sum(CASE WHEN NOT first_half THEN f END)
                        AS BIGINT) AS f2
            FROM halves GROUP BY event_type
        ),
        both_sides AS (
            SELECT * FROM wide
            WHERE f1 IS NOT NULL AND f2 IS NOT NULL
        ),
        tot AS (
            SELECT CAST(sum(f1) AS BIGINT) AS t1,
                   CAST(sum(f2) AS BIGINT) AS t2
            FROM both_sides
        ),
        per AS (
            SELECT event_type, f1, f2, t1, t2,
                   (CAST(f1 AS HUGEINT) * t2
                    - CAST(f2 AS HUGEINT) * t1)
                   * ({_L.format('f1 * CAST(t2 AS HUGEINT)')}
                      - {_L.format('f2 * CAST(t1 AS HUGEINT)')})
                   AS contrib_u
            FROM both_sides, tot
        ),
        shown AS (
            SELECT event_type, f1 AS n_first, f2 AS n_second,
                   {halfup_ratio_wide_sql('f1', 't1', 4, 'duck')}
                       AS p_first,
                   {halfup_ratio_wide_sql('f2', 't2', 4, 'duck')}
                       AS p_second,
                   CAST(contrib_u AS DOUBLE) / (CAST(t1 AS DOUBLE)
                       * CAST(t2 AS DOUBLE)
                       * CAST(1000000 AS DOUBLE)) AS psi_contrib
            FROM per
            UNION ALL
            SELECT '(all)', CAST(sum(f1) AS BIGINT),
                   CAST(sum(f2) AS BIGINT),
                   {halfup_ratio_wide_sql(
                       'sum(f1)', 'any_value(t1)', 4, 'duck')},
                   {halfup_ratio_wide_sql(
                       'sum(f2)', 'any_value(t2)', 4, 'duck')},
                   CAST(sum(contrib_u) AS DOUBLE)
                       / (CAST(any_value(t1) AS DOUBLE)
                          * CAST(any_value(t2) AS DOUBLE)
                          * CAST(1000000 AS DOUBLE))
            FROM per
        )
        SELECT * FROM shown ORDER BY event_type
    """,
}


# ------------------------------------------- seasonal anomalies

#: STL-lite geometry: centered +/-TREND_HALF hours for the trend
#: (7 days), 168-hour weekly seasonality, 3-sigma flag, top-N head
TREND_HALF = 84
SEASON_HOURS = 168
ANOM_TOP = 20

#: signed integer HALF-UP quotient (digits=0): magnitude-rounded,
#: sign re-applied — the only rounding the decomposition performs,
#: once per stage, deterministically in both engines
_SHU = (
    "((CASE WHEN ({n}) < 0 THEN -1 ELSE 1 END)"
    " * ((abs({n}) * 2 + ({d})) {div} (({d}) * 2)))"
)


def seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal anomaly detection on the hourly event-count
    series: count = trend (+/-7-day centered mean) + weekly
    seasonal (hour-of-week mean of the detrended series) +
    residual; the ANOM_TOP hours with the largest |residual| are
    the ones neither trend nor weekday rhythm explains — the
    complement of `cusum_changepoint` (level shifts) and
    `robust_outliers` (static distribution).

    Exactness: counts are integers; the trend is HALF-UP quantized
    to integer milli-events ONCE per hour (signed integer quotient
    — no double mean), the detrended series and the seasonal means
    stay integer (one more signed half-up per hour-of-week), so
    RESIDUALS ARE EXACT INTEGERS and the only doubles are the final
    sigma (one shared-text sqrt over integer power sums) and the
    display divides. The top-N cut orders by an integer.

    Scale shape: the corpus-sized work is ONE map-side-combinable
    hourly aggregate; everything after runs on the hours frame —
    bounded by the CALENDAR SPAN, never the corpus (the
    activity_acf contract) — so the unpartitioned RANGE window is a
    bounded frame, not a corpus sort.
    """
    shu = lambda n, d: _SHU.format(n=n, d=d, div="div")  # noqa: E731
    hours = (
        load(spark, sf_dir, "events")
        .groupBy(F.expr(floordiv_sql("unix_micros(ts)", HOUR_US)).alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    w = (
        Window.orderBy("h")
        .rangeBetween(-TREND_HALF, TREND_HALF)
    )  # hours-frame window: bounded by the calendar span
    trended = hours.select(
        "h",
        "c",
        F.sum("c").over(w).alias("ts_"),
        F.count(F.lit(1)).over(w).alias("tn_"),
    ).selectExpr(
        "h",
        "c",
        f"{shu('1000 * ts_', 'tn_')} AS trend_m",
    ).selectExpr(
        "h", "c", "trend_m", "1000 * c - trend_m AS d_m",
        f"h % {SEASON_HOURS} AS how",
    ).localCheckpoint(eager=False)
    seasonal = trended.groupBy("how").agg(
        F.expr(f"{shu('sum(d_m)', 'count(1)')}").alias("season_m")
    )
    resid = trended.join(F.broadcast(seasonal), "how").selectExpr(
        "h", "c", "trend_m", "season_m", "how",
        "d_m - season_m AS resid_m",
    )
    sig = resid.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("resid_m").alias("sr"),
        F.sum(F.expr("resid_m * resid_m")).alias("srr"),
    )
    sigma = (
        "sqrt(CAST(srr AS DOUBLE) / CAST(n AS DOUBLE)"
        " - (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))"
        " * (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)))"
    )
    return (
        resid.crossJoin(F.broadcast(sig))
        .selectExpr(
            f"timestamp_micros(h * {HOUR_US}) AS hour_ts",
            "how",
            "c AS n_events",
            "CAST(trend_m AS DOUBLE) / CAST(1000 AS DOUBLE) AS trend",
            "CAST(season_m AS DOUBLE) / CAST(1000 AS DOUBLE)"
            " AS seasonal",
            "CAST(resid_m AS DOUBLE) / CAST(1000 AS DOUBLE)"
            " AS residual",
            f"CASE WHEN {sigma} > 0 THEN"
            f" CAST(resid_m AS DOUBLE) / {sigma} END AS z",
            "abs(resid_m) AS _a",
        )
        .orderBy(F.desc("_a"), F.asc("hour_ts"))
        .limit(ANOM_TOP)
        .drop("_a")
    )


QUERIES["seasonal_anomalies"] = seasonal_anomalies


def _seasonal_oracle() -> str:
    shu = lambda n, d: _SHU.format(n=n, d=d, div="//")  # noqa: E731
    sigma = (
        "sqrt(CAST(srr AS DOUBLE) / CAST(n AS DOUBLE)"
        " - (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))"
        " * (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)))"
    )
    return f"""
        WITH hours AS (
            SELECT {_H_FLOOR} AS h,
                   count(*) AS c
            FROM events GROUP BY 1
        ),
        trended AS (
            SELECT h, c,
                   {shu('1000 * ts_', 'tn_')} AS trend_m,
                   h % {SEASON_HOURS} AS how
            FROM (
                SELECT h, c,
                       CAST(sum(c) OVER w AS BIGINT) AS ts_,
                       CAST(count(*) OVER w AS BIGINT) AS tn_
                FROM hours
                WINDOW w AS (ORDER BY h RANGE BETWEEN {TREND_HALF}
                             PRECEDING AND {TREND_HALF} FOLLOWING)
            )
        ),
        d AS (
            SELECT *, 1000 * c - trend_m AS d_m FROM trended
        ),
        seasonal AS (
            SELECT how,
                   {shu('CAST(sum(d_m) AS BIGINT)', 'count(*)')}
                       AS season_m
            FROM d GROUP BY how
        ),
        resid AS (
            SELECT d.h, d.c, d.trend_m, seasonal.season_m, d.how,
                   d.d_m - seasonal.season_m AS resid_m
            FROM d JOIN seasonal USING (how)
        ),
        sig AS (
            SELECT count(*) AS n,
                   CAST(sum(resid_m) AS BIGINT) AS sr,
                   CAST(sum(resid_m * resid_m) AS BIGINT) AS srr
            FROM resid
        )
        SELECT make_timestamp(h * {HOUR_US}) AS hour_ts,
               how,
               c AS n_events,
               CAST(trend_m AS DOUBLE) / CAST(1000 AS DOUBLE)
                   AS trend,
               CAST(season_m AS DOUBLE) / CAST(1000 AS DOUBLE)
                   AS seasonal,
               CAST(resid_m AS DOUBLE) / CAST(1000 AS DOUBLE)
                   AS residual,
               CASE WHEN {sigma} > 0 THEN
                   CAST(resid_m AS DOUBLE) / {sigma} END AS z
        FROM resid CROSS JOIN sig
        ORDER BY abs(resid_m) DESC, hour_ts ASC
        LIMIT {ANOM_TOP}
    """


ORACLES["seasonal_anomalies"] = _seasonal_oracle()


#: circular-statistics quantizer: milli-units per cos/sin component.
#: Quantized CONSTANTS (168 of each, generated once in python and
#: inlined literally into BOTH engines' plans), so every downstream
#: number is an exact integer; 1e-3 component resolution bounds the
#: R^2 error at ~1e-3 while the 128-bit ppm division stays inside
#: DECIMAL(38,0) up to ~1e16 events per type.
CIRC_QUANT = 1000
SEASON_HOW = 168  # hour-of-week period


def _circ_consts() -> list[tuple[int, int, int]]:
    import math

    return [
        (
            k,
            round(math.cos(2 * math.pi * k / SEASON_HOW) * CIRC_QUANT),
            round(math.sin(2 * math.pi * k / SEASON_HOW) * CIRC_QUANT),
        )
        for k in range(SEASON_HOW)
    ]


def seasonal_circular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular seasonality per event type: the hour-of-week RESULTANT
    VECTOR (Fisher's circular statistics) — each event is a unit
    vector at angle 2*pi*how/168; the squared mean resultant length
    R^2 = (sx^2 + sy^2) / n^2 measures how concentrated activity is
    around one time of week (0 = perfectly uniform cadence, 1 = all
    traffic in one hour). Complements the existing seasonal tools:
    `seasonal_anomalies` flags WHICH hours deviate, the ACF measures
    lag correlation — R^2 is the one-number seasonality STRENGTH, and
    the peak hour-of-week rides alongside.

    Exactness: the hour-of-week is pure integer epoch arithmetic
    ((unix_micros div hour) mod 168 — no calendar functions, so no
    Sunday=0-vs-1 cross-engine trap); cos/sin enter as 168 quantized
    INTEGER constants shared literally by both engines; sx/sy are
    exact integer sums; R^2 in ppm is one 128-bit integral division.

    Scale shape: one shuffle to the (type x 168)-bounded histogram;
    the constants lattice is a broadcast join; the peak is a window
    over <=168 rows per type. Nothing downstream of the first
    aggregate is corpus-sized."""
    from pyspark.sql import Window

    consts = spark.createDataFrame(
        _circ_consts(), "how int, ck long, sk long"
    )
    hist = (
        load(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            # pmod over floor-div: a canonical NON-NEGATIVE
            # hour-of-week for any epoch sign (Spark `div`+`%` and
            # DuckDB `//`+`%` disagree on negatives — both fixed to
            # the same mathematical residue; see the oracle's
            # double-% form)
            F.expr(
                f"CAST(pmod({floordiv_sql('unix_micros(ts)', HOUR_US)},"
                f" {SEASON_HOW}) AS INT)"
            ).alias("how"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .join(F.broadcast(consts), "how")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.desc("c"), F.asc("how")
                )
            ),
        )
    )
    return (
        hist.groupBy("event_type")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.col("ck")).alias("sx"),
            F.sum(F.col("c") * F.col("sk")).alias("sy"),
            F.max(F.when(F.col("rn") == 1, F.col("how"))).alias("peak_how"),
            F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("peak_count"),
        )
        .selectExpr(
            "event_type",
            "n",
            "sx",
            "sy",
            "(CAST(sx AS DECIMAL(38,0)) * sx + CAST(sy AS DECIMAL(38,0))"
            f" * sy) * 1000000 div (CAST(n AS DECIMAL(38,0)) * n"
            f" * {CIRC_QUANT * CIRC_QUANT}) AS r2_ppm",
            "peak_how",
            "peak_count",
        )
        .orderBy("event_type")
    )


QUERIES["seasonal_circular"] = seasonal_circular


def _seasonal_circular_oracle() -> str:
    vals = ", ".join(f"({k}, {c}, {s})" for k, c, s in _circ_consts())
    return f"""
        WITH consts(how, ck, sk) AS (VALUES {vals}),
        hist AS (
            SELECT event_type,
                   CAST((((({_H_FLOOR})
                        % {SEASON_HOW}) + {SEASON_HOW})
                        % {SEASON_HOW}) AS INT) AS how,
                   count(*) AS c
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT h.event_type, h.how, h.c, k.ck, k.sk,
                   row_number() OVER (
                       PARTITION BY h.event_type
                       ORDER BY h.c DESC, h.how
                   ) AS rn
            FROM hist h JOIN consts k USING (how)
        )
        SELECT event_type,
               CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(c * ck) AS BIGINT) AS sx,
               CAST(sum(c * sk) AS BIGINT) AS sy,
               CAST((CAST(sum(c * ck) AS HUGEINT) * sum(c * ck)
                     + CAST(sum(c * sk) AS HUGEINT) * sum(c * sk))
                    * 1000000
                    // (CAST(sum(c) AS HUGEINT) * sum(c)
                        * {CIRC_QUANT * CIRC_QUANT}) AS BIGINT)
                   AS r2_ppm,
               max(CASE WHEN rn = 1 THEN how END) AS peak_how,
               CAST(max(CASE WHEN rn = 1 THEN c END) AS BIGINT)
                   AS peak_count
        FROM ranked
        GROUP BY event_type
        ORDER BY event_type
    """


ORACLES["seasonal_circular"] = _seasonal_circular_oracle()
