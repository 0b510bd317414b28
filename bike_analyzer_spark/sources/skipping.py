"""File-level data skipping — the public Delta/Iceberg idea of
storing per-file column min/max stats in table metadata and pruning
the file list BEFORE the engine ever opens a file.

Spark's parquet reader already skips row groups via footer stats,
but it still has to LIST and OPEN every file to read those footers;
at 100 TB (~10^5 files) a stats table turns "open 100k footers" into
"scan a 100k-row metadata table, open the 40 files that can match".
This is exactly what `layout.write_zorder` exists to feed: z-ordered
files are tight in BOTH dimensions, so a 2-D predicate prunes to a
handful of files; a single-column sort prunes on one dimension only
(both behaviors pinned in tests/test_skipping.py).

Shape:
- `build_stats` is ONE aggregation scan grouped by
  `input_file_name()` — the same cost Delta pays computing add-file
  stats at write time; it lands as a `<path>._stats` parquet sidecar
  (metadata ~ 1 row per file, corpus-size-independent per file).
- `pruned_read` reads the sidecar (not the data), keeps files whose
  [min,max] interval intersects the predicate, and opens ONLY those
  — then re-applies the predicate, since file-level stats are
  necessary, not sufficient.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stats_path(path: str) -> str:
    return os.path.normpath(path) + "._stats"


def build_stats(spark: SparkSession, path: str, cols: list[str]) -> None:
    """One scan → per-file (n_rows, min/max of each col) sidecar."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(_stats_path(path))
    )


def _read_sidecar(path: str):
    """The stats sidecar as one pyarrow table. It is METADATA (a row
    per data file), so the driver reads it directly — no Spark job,
    no executor round-trip; exactly how an engine consults a table
    format's stats before planning a scan."""
    import pyarrow.parquet as papq

    return papq.read_table(_stats_path(path))


def stats_cols(spark: SparkSession, path: str) -> list[str]:
    """Columns covered by the table's stats sidecar ([] if none) —
    lets maintenance (`cli optimize`) refresh a sidecar it didn't
    create instead of leaving it stale after a rewrite."""
    if not os.path.exists(_stats_path(path)):
        return []
    return [
        name.removeprefix("min_")
        for name in _read_sidecar(path).schema.names
        if name.startswith("min_")
    ]


def candidate_files(
    spark: SparkSession, path: str, col: str, lo, hi
) -> list[str]:
    """Files whose [min,max] for `col` intersects [lo, hi] — resolved
    from the stats sidecar alone (a driver-side metadata read)."""
    t = _read_sidecar(path).select(["file", f"min_{col}", f"max_{col}"])

    def _naive(v):
        # Spark writes timestamps as UTC-adjusted; arrow returns them
        # tz-aware while Spark rows are naive UTC wall-clock — compare
        # on the naive form (everything in this engine is UTC)
        return v.replace(tzinfo=None) if hasattr(v, "tzinfo") and v.tzinfo else v

    def _intersects(r) -> bool:
        mn, mx = r[f"min_{col}"], r[f"max_{col}"]
        if mn is None or mx is None:
            # a file whose rows are all-NULL for `col` has NULL stats:
            # it cannot be PROVEN prunable, so it stays a candidate
            # (comparing None raised and broke every pruned read of
            # the table — round-7 ADVICE); the exact predicate re-
            # applied by pruned_read drops its rows
            return True
        return _naive(mx) >= lo and _naive(mn) <= hi

    return [r["file"] for r in t.to_pylist() if _intersects(r)]


def pruned_read(
    spark: SparkSession, path: str, col: str, lo, hi
) -> DataFrame:
    """Read only the files that can contain `col` in [lo, hi], then
    re-apply the exact predicate (file stats are necessary, not
    sufficient). An empty candidate list short-circuits to an empty
    frame with the table's schema — no file opens at all."""
    files = candidate_files(spark, path, col, lo, hi)
    schema = spark.read.parquet(path).schema
    if not files:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .parquet(*files)
        .filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
    )
