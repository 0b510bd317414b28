"""Domain-mixture rebalancing — the source-reweighting step training
pipelines run before packing (The Pile / Dolma style: each source gets
a target share of the training budget, implemented as deterministic
per-source downsampling).

Target here: equal CHARACTER budget per source (the sf fixtures are
uniform by document count, so balancing on doc count would be a
no-op; balancing on bytes is also the realistic contract — training
budgets are token- not document-denominated). The acceptance
threshold for source s is

    threshold_ppm(s) = floor(min_total_chars * 1e6 / total_chars(s))

— pure BIGINT arithmetic, bit-identical in Spark and DuckDB (no float
ratio ever exists). A document survives iff

    hash64(doc_id, 'mix') % 1e6 < threshold_ppm(source)

with the same md5-derived portable hash both engines share
(functions.textfns.hash64), so the resample is deterministic,
engine-independent, and stable under corpus growth (a doc's fate
depends only on its id and its source's ratio).

100 TB shape: one tiny per-source aggregate (|sources| rows), its min
folded in and BROADCAST back; the corpus side is a single narrow
filter projection — no corpus shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import hash64, hash64_duck
from ..sources.catalog import load

PPM = 1_000_000
_SALT = "mix"


def _weights(docs: DataFrame) -> DataFrame:
    """(source, n_docs, total_chars, threshold_ppm) — sources-sized."""
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    mn = per.agg(F.min("total_chars").alias("min_total"))
    # `div`, not `/` + cast: Spark's float division + bigint cast
    # truncates while DuckDB's double->bigint cast ROUNDS — integer
    # floor division on both engines keeps the threshold bit-identical
    return per.crossJoin(F.broadcast(mn)).select(
        "source",
        "n_docs",
        "total_chars",
        F.expr(f"(min_total * {PPM}) div total_chars").alias("threshold_ppm"),
    )


def _accepted(docs: DataFrame, weights: DataFrame) -> DataFrame:
    keep = (
        hash64(F.col("doc_id").cast("string"), _SALT) % PPM
        < F.col("threshold_ppm")
    )
    return docs.join(F.broadcast(weights), "source").filter(keep)


def mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture table: size, acceptance threshold, and the
    achieved post-resample count (self-verifying: n_kept realizes the
    threshold on this corpus)."""
    docs = load(spark, sf_dir, "documents")
    w = _weights(docs)
    kept = (
        _accepted(docs, w)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        w.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "total_chars",
            "threshold_ppm",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy("source")
    )


def mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rebalanced corpus: documents surviving their source's
    deterministic acceptance test."""
    docs = load(spark, sf_dir, "documents")
    return (
        _accepted(docs, _weights(docs))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


QUERIES = {
    "mix_weights": mix_weights,
    "mix_resample": mix_resample,
}

_H = hash64_duck("CAST(doc_id AS VARCHAR)", f"'{_SALT}'")

_WEIGHTS_SQL = f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST((min(sum(n_chars)) OVER () * {PPM}) // sum(n_chars)
                AS BIGINT) AS threshold_ppm
    FROM documents GROUP BY source
"""

ORACLES = {
    "mix_weights": f"""
        WITH w AS ({_WEIGHTS_SQL}),
        kept AS (
            SELECT d.source, count(*) AS n_kept
            FROM documents d JOIN w USING (source)
            WHERE {_H} % {PPM} < w.threshold_ppm
            GROUP BY d.source
        )
        SELECT w.source, w.n_docs, w.total_chars, w.threshold_ppm,
               coalesce(kept.n_kept, 0) AS n_kept
        FROM w LEFT JOIN kept USING (source)
        ORDER BY source
    """,
    "mix_resample": f"""
        WITH w AS ({_WEIGHTS_SQL})
        SELECT d.doc_id, d.source, d.n_chars
        FROM documents d JOIN w USING (source)
        WHERE {_H} % {PPM} < w.threshold_ppm
        ORDER BY doc_id
    """,
}
