"""Z-order (Morton-curve) data layout for multi-dimensional data
skipping — the public Delta/Iceberg `OPTIMIZE ZORDER BY` idea: when
queries filter on TWO columns (here events.user_id AND events.ts),
sorting files by either column alone leaves the other's per-file
min/max spans at ~full range, so file-level stats can't skip. A
Z-order key interleaves the bits of both dimensions; files cut along
it stay tight in BOTH.

This module computes the key with pure integer column algebra —
bit-exact in both engines — and audits the layout it would produce:
rows are binned into N_FILES files by equal-width z ranges (a plain
projection: `z >> bits` — no ntile window over the corpus, which
would be a global sort at scale) and, for contrast, into N_FILES
time-range files. The audit reports each file's (user, time) spans
in normalized 0..255 grid units; the z layout's spans are tight in
both dimensions, the time layout's user span is ~full (asserted in
tests and visible in the query output).

At 100 TB the WRITE path is `repartitionByRange(z)` +
`sortWithinPartitions(z)` + per-file min/max stats — one range
exchange, exactly what a single-column sort would cost. The audit
here is one scan + one 2×N_FILES-group aggregate; the 1-row
min/max normalization aggregate is broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load

#: per-dimension grid resolution (bits); 8 → 0..255 cells
GRID_BITS = 8
#: audited file count; must be a power of two ≤ 2^(2*GRID_BITS)
N_FILES = 16


def _morton(u: Column, t: Column) -> Column:
    """Interleave two GRID_BITS-bit integers into the Morton key —
    a sum of 2*GRID_BITS masked shift terms, all integer bit ops."""
    z = F.lit(0)
    for i in range(GRID_BITS):
        u_bit = F.shiftright(u, i).bitwiseAND(F.lit(1))
        t_bit = F.shiftright(t, i).bitwiseAND(F.lit(1))
        z = z + u_bit * (1 << (2 * i + 1)) + t_bit * (1 << (2 * i))
    return z


def _morton_sql(u: str, t: str) -> str:
    """DuckDB twin of `_morton`, generated from the same loop."""
    terms = []
    for i in range(GRID_BITS):
        terms.append(f"(({u} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({t} // {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout audit: for each of N_FILES files under (a) equal-width
    Z-range cuts and (b) equal-width time-range cuts, the row count
    and the per-file user/time grid spans. Tight spans = skippable
    files. One scan feeds both layouts (the layout label is a
    projection, not a second read)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").cast("long").alias("u"),
        F.unix_micros("ts").alias("t"),
    )
    bounds = ev.agg(
        F.min("u").alias("u_lo"),
        F.max("u").alias("u_hi"),
        F.min("t").alias("t_lo"),
        F.max("t").alias("t_hi"),
    )
    # grid cells via true INTEGER division (`div`) — a double `/`
    # loses exactness past 2^53, which epoch-micros products exceed
    g = ev.crossJoin(F.broadcast(bounds)).selectExpr(
        f"((u - u_lo) * {1 << GRID_BITS}) div (u_hi - u_lo + 1) AS ug",
        f"((t - t_lo) * {1 << GRID_BITS}) div (t_hi - t_lo + 1) AS tg",
    )
    z_shift = 2 * GRID_BITS - N_FILES.bit_length() + 1
    t_shift = GRID_BITS - N_FILES.bit_length() + 1
    both = g.select(
        F.lit("zorder").alias("layout"),
        F.shiftright(
            _morton(F.col("ug"), F.col("tg")).cast("int"), z_shift
        )
        .cast("long")
        .alias("file_id"),
        "ug",
        "tg",
    ).unionByName(
        g.select(
            F.lit("time").alias("layout"),
            F.shiftright(F.col("tg").cast("int"), t_shift)
            .cast("long")
            .alias("file_id"),
            "ug",
            "tg",
        )
    )
    return (
        both.groupBy("layout", "file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("ug") - F.min("ug")).alias("u_span"),
            (F.max("tg") - F.min("tg")).alias("t_span"),
        )
        .orderBy("layout", "file_id")
    )


def _as_long_expr(df: DataFrame, col: str) -> str:
    """SQL expression lifting a column to bigint for grid math
    (timestamps via unix_micros; numerics via cast)."""
    dt = dict(df.dtypes)[col]
    if dt.startswith("timestamp"):
        return f"unix_micros({col})"
    return f"CAST({col} AS BIGINT)"


def write_zorder_cols(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = N_FILES,
) -> None:
    """The actual OPTIMIZE-ZORDER write path for ANY two numeric/
    timestamp columns: compute the Morton key, range-partition the
    table on it (ONE exchange — the same cost as a single-column
    sort), sort within partitions, and land one file per partition.
    Parquet then stores per-file/row-group min/max stats that are
    tight in BOTH dimensions — verified from the written footers in
    tests/test_layout.py, not just from the audit query."""
    a, b = _as_long_expr(df, col_a), _as_long_expr(df, col_b)
    bounds = df.selectExpr(
        f"min({a}) AS u_lo",
        f"max({a}) AS u_hi",
        f"min({b}) AS t_lo",
        f"max({b}) AS t_hi",
    )
    g = df.crossJoin(F.broadcast(bounds)).selectExpr(
        "*",
        f"(({a} - u_lo) * {1 << GRID_BITS}) div (u_hi - u_lo + 1) AS _ug",
        f"(({b} - t_lo) * {1 << GRID_BITS}) div (t_hi - t_lo + 1) AS _tg",
    )
    (
        g.withColumn("_z", _morton(F.col("_ug"), F.col("_tg")))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("u_lo", "u_hi", "t_lo", "t_hi", "_ug", "_tg", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zorder(
    spark: SparkSession, sf_dir: str, path: str, n_files: int = N_FILES
) -> None:
    """events z-ordered on (user_id, ts) — the corpus instance of
    `write_zorder_cols`."""
    write_zorder_cols(
        load(spark, sf_dir, "events"), path, "user_id", "ts", n_files
    )


QUERIES = {"zorder_layout_stats": zorder_layout_stats}

_Z_SHIFT = 2 * GRID_BITS - N_FILES.bit_length() + 1
_T_SHIFT = GRID_BITS - N_FILES.bit_length() + 1

ORACLES = {
    "zorder_layout_stats": f"""
        WITH ev AS (
            SELECT CAST(user_id AS BIGINT) AS u,
                   CAST(epoch_us(ts) AS BIGINT) AS t
            FROM events
        ),
        bounds AS (
            SELECT min(u) AS u_lo, max(u) AS u_hi,
                   min(t) AS t_lo, max(t) AS t_hi
            FROM ev
        ),
        g AS (
            SELECT ((u - u_lo) * {1 << GRID_BITS})
                       // (u_hi - u_lo + 1) AS ug,
                   ((t - t_lo) * {1 << GRID_BITS})
                       // (t_hi - t_lo + 1) AS tg
            FROM ev CROSS JOIN bounds
        ),
        layouts AS (
            SELECT 'zorder' AS layout,
                   ({_morton_sql("ug", "tg")}) // {1 << _Z_SHIFT}
                       AS file_id,
                   ug, tg
            FROM g
            UNION ALL
            SELECT 'time' AS layout, tg // {1 << _T_SHIFT} AS file_id,
                   ug, tg
            FROM g
        )
        SELECT layout, CAST(file_id AS BIGINT) AS file_id,
               count(*) AS n_rows,
               CAST(max(ug) - min(ug) AS BIGINT) AS u_span,
               CAST(max(tg) - min(tg) AS BIGINT) AS t_span
        FROM layouts
        GROUP BY layout, file_id
        ORDER BY layout, file_id
    """,
}
