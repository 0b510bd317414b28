"""Exact-substring duplication analysis over `documents` — the
content-defined-chunking approximation of suffix-array substring
dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better", dedups exact substrings >= 50 tokens via a suffix
array; a distributed corpus can't build one global suffix array, so
the scale-out standard is window fingerprints at CONTENT-DEFINED
anchor positions — the winnowing / Rabin-chunking family).

Anchoring must be content-defined, not position-aligned: windows
taken every STRIDE chars from the document start only collide when
the two copies of a duplicated run happen to sit at the same offset
mod STRIDE in both documents (a 1-in-STRIDE accident — the first
version of this module had exactly that bug, caught by the planted-
alignment test). Here a position is an anchor iff the hash of the
ANCHOR_W-char probe starting there ≡ 0 (mod STRIDE) — a property of
the run's CONTENT, so both copies of a duplicated run select the
same run-relative anchors, and any shared run long enough to contain
an anchored window (~WIN + STRIDE expected, geometric tail) yields
identical fingerprints in both documents regardless of alignment.

Two surfaces:

* `span_dedup_stats` — per document: how many of its anchored
  windows also appear (by content hash) in at least one OTHER
  document. The per-doc signal a curation pass thresholds on
  ("drop docs that are mostly boilerplate shared with others").
* `span_top_shared` — the most widely shared window fingerprints
  (bounded top-k): the "what IS this boilerplate" drill-down.

Scale shape: candidate positions explode to ~len rows per doc
(corpus-linear, the same order as any tokenize-explode operator
here); the anchor filter keeps ~1/STRIDE of them BEFORE the window
hash is computed (predicate ordering keeps the wide md5 off the
rejected rows); duplicated-hash detection is one aggregate on a
uniform md5-derived key; the join back is hash-keyed on the same
uniform key and AQE broadcasts the duplicated side while it fits.
The top-k is a TakeOrderedAndProject. No all-pairs, no global sort.

Portable hashing: anchors and windows use the repo's md5-prefix
`hash64`, bit-identical in Spark and DuckDB, so both engines agree
on every anchor decision and fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import hash64, hash64_duck
from ..sources.catalog import load

#: fingerprint window width (chars)
WIN = 64
#: expected anchor spacing: P(position is an anchor) = 1/STRIDE
STRIDE = 32
#: anchor probe width (chars)
ANCHOR_W = 8
#: bounded drill-down size
TOP_SHARED = 20


def _windows(docs: DataFrame) -> DataFrame:
    """(doc_id, h): one row per anchored WIN-char window. Positions
    run 1..len-WIN+1 (docs shorter than WIN contribute nothing; the
    sequence() is guarded — Spark infers a NEGATIVE step when
    start > stop); a position anchors iff its ANCHOR_W-char probe
    hash ≡ 0 mod STRIDE."""
    n_pos = (F.length("text") - WIN + 1).cast("int")
    ks = F.when(
        F.length("text") >= WIN, F.sequence(F.lit(1), n_pos)
    ).otherwise(F.array().cast("array<int>"))
    return (
        docs.select("doc_id", "text", F.explode(ks).alias("i"))
        .filter(
            hash64(F.substring(F.col("text"), F.col("i"), ANCHOR_W))
            % STRIDE
            == 0
        )
        .select(
            "doc_id",
            hash64(F.substring(F.col("text"), F.col("i"), WIN)).alias("h"),
        )
    )


def _dup_hashes(wins: DataFrame) -> DataFrame:
    """Window fingerprints appearing in >= 2 DISTINCT documents."""
    return (
        wins.groupBy("h")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def span_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplication profile: anchored windows, windows
    whose content appears in another document, and the duplicated
    fraction (0.0 for docs with no anchored window)."""
    docs = load(spark, sf_dir, "documents")
    # lazily checkpointed: the per-doc stats and the duplicated-hash
    # aggregate both consume the anchored windows, and the window
    # frame is 1/STRIDE the size of the position explosion it is
    # derived from — materializing it runs the expensive
    # every-position anchor hashing once instead of per consumer
    wins = _windows(docs).localCheckpoint(eager=False)
    dup = _dup_hashes(wins).select("h", F.lit(1).alias("_dup"))
    per_doc = (
        wins.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).alias("n_dup"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.when(
                F.coalesce("n_windows", F.lit(0)) > 0,
                F.round(F.col("n_dup") / F.col("n_windows"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
        .orderBy("doc_id")
    )


def span_top_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOP_SHARED most widely shared window fingerprints — ranked
    by distinct-document spread, then total occurrences, then hash
    (fully deterministic)."""
    wins = _windows(load(spark, sf_dir, "documents"))
    return (
        _dup_hashes(wins)
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("h"))
        .limit(TOP_SHARED)
    )


QUERIES = {
    "span_dedup_stats": span_dedup_stats,
    "span_top_shared": span_top_shared,
}

# ---- DuckDB twins -------------------------------------------------

_WINS_CTES = f"""
    WITH wins AS (
        SELECT doc_id,
               {hash64_duck(f"substr(text, k, {WIN})")} AS h
        FROM documents,
             unnest(range(1, length(text) - {WIN} + 2)) t(k)
        WHERE length(text) >= {WIN}
          AND {hash64_duck(f"substr(text, k, {ANCHOR_W})")}
              % {STRIDE} = 0
    ),
    dup AS (
        SELECT h, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        FROM wins GROUP BY h
        HAVING count(DISTINCT doc_id) >= 2
    )
"""

ORACLES = {
    "span_dedup_stats": f"""
        {_WINS_CTES},
        per_doc AS (
            SELECT w.doc_id, count(*) AS n_windows,
                   CAST(sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup
            FROM wins w LEFT JOIN dup d ON d.h = w.h
            GROUP BY w.doc_id
        )
        SELECT doc_id,
               coalesce(n_windows, 0) AS n_windows,
               coalesce(n_dup, 0) AS n_dup,
               CASE WHEN coalesce(n_windows, 0) > 0
                    THEN round(n_dup / n_windows, 4)
                    ELSE CAST(0.0 AS DOUBLE) END AS dup_fraction
        FROM documents LEFT JOIN per_doc USING (doc_id)
        ORDER BY doc_id
    """,
    "span_top_shared": f"""
        {_WINS_CTES}
        SELECT h, n_docs, n_occ
        FROM dup
        ORDER BY n_docs DESC, n_occ DESC, h ASC
        LIMIT {TOP_SHARED}
    """,
}
