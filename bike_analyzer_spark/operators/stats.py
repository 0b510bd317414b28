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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import cents
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
