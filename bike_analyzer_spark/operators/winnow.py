"""Winnowing fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD'03,
the MOSS algorithm): select, from every window of W consecutive
k-gram hashes, the RIGHTMOST MINIMUM hash as a document fingerprint.
Two documents sharing any sufficiently long run of tokens (length >=
W + k - 1) are GUARANTEED to share a fingerprint — the local-match
guarantee MinHash can only give probabilistically — while the
fingerprint density stays ~2/(W+1) of positions.

This completes the near-dup candidate-generation family: MinHash+LSH
(probabilistic, whole-doc), SimHash (Hamming, whole-doc), prefix/SNM
set joins (exact set predicates), winnowing (LOCAL match guarantee —
the plagiarism/quote detector's primitive).

Like SNM, winnowing is a RECALL TRADE (pairs sharing only short runs
may never share a fingerprint), so the DuckDB oracle replicates the
selection exactly rather than running a naive join — the gate proves
the selection math (window minima, tie-breaks, boundary windows),
and the local-match guarantee is pinned by a property test.

Cross-engine exactness: the rightmost-minimum selection rides ONE
integer key, hp * 2^20 + (2^20 - pos) — hp is the 32-bit portable
md5 hash (`textfns.hash64`), pos < 2^20 is the 1-based k-gram
position, so min(key) picks (min hp, then MAX pos) and the key stays
under 2^52: pure bigint window minima, bit-identical on both
engines.

Scale shape: per-document window over the k-gram sequence (partition
= doc_id, bounded by document length); the candidate join is an
equi-join on the fingerprint with the family's document-frequency
cap (work = sum_fp df^2, hot fingerprints bounded); the verify is
the intersection-counting join shared with setjoin. Nothing is
corpus-quadratic.

Reference parity: none (the reference has no dedup) — part of the
beyond-reference LLM-data-pipeline pack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import (
    hash64,
    hash64_duck,
    shingle_exprs,
    shingles_duck,
    tokens,
)
from ..sources.catalog import load
from .setjoin import _doc_shingle_sets, _exact_verify

#: k-gram size (tokens) — the corpus-wide 3-token shingle
WINNOW_K = 3
#: winnowing window: W consecutive k-gram hashes per selection window;
#: guarantees any shared token run of length >= W + K - 1 (= 6) is
#: detected, at fingerprint density ~2/(W+1)
WINNOW_W = 4
#: position packing: pos < 2^20 (a million k-grams per document —
#: far above this corpus's longest doc), so key = hp*2^20 + (2^20-pos)
#: stays < 2^52 and min(key) = (min hp, then max pos)
_POS_PACK = 1 << 20

#: hot-fingerprint document-frequency cap (the NGRAM_DF_CAP /
#: COSINE_DF_CAP discipline): a fingerprint shared by more than this
#: many docs is dropped before the candidate self-join, bounding the
#: join at sum_fp min(df, cap)^2
WINNOW_DF_CAP = 64

#: report candidate pairs at/above this exact Jaccard (the dedup
#: family's JACCARD_FLOOR as an exact rational)
FLOOR_NUM = 1
FLOOR_DEN = 20


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, fp) winnowing fingerprints: the rightmost
    minimum 32-bit k-gram hash of every W-window, plus the single
    truncated window at pos 1 for documents shorter than W k-grams."""
    grams = (
        docs.withColumn("toks", tokens("text"))
        .select(
            "doc_id",
            F.posexplode(shingle_exprs("toks", WINNOW_K)).alias(
                "pos0", "sh"
            ),
        )
        # 1-based position, matching DuckDB's generate_subscripts
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            hash64(F.col("sh")).alias("hp"),
        )
    )
    per_doc = Window.partitionBy("doc_id")
    w_sel = per_doc.orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    keyed = grams.withColumn(
        "key",
        F.col("hp") * F.lit(_POS_PACK)
        + (F.lit(_POS_PACK) - F.col("pos")),
    ).withColumn("m", F.count(F.lit(1)).over(per_doc))
    sel = (
        keyed.withColumn("wmin", F.min("key").over(w_sel))
        # full windows only (start <= m-W+1); a doc with fewer than W
        # k-grams keeps its single truncated window at pos 1
        .filter(
            (F.col("pos") <= F.col("m") - (WINNOW_W - 1))
            | (F.col("pos") == 1)
        )
        .select(
            "doc_id",
            F.expr(f"wmin div {_POS_PACK}").alias("fp"),
        )
        .distinct()
    )
    return sel


def winnow_pairs(docs: DataFrame) -> DataFrame:
    """Candidate pairs sharing a winnowing fingerprint, verified with
    exact shingle-set Jaccard >= FLOOR. Returns
    (a, b, inter, na, nb, jacc_bp).

    Verify plan — INTERSECTION-FIRST, the `dedup_containment`
    measurement replayed: this corpus's docs share short runs
    promiscuously, so the fingerprint join admits ~334k candidates
    at sf0.1 while only 418 clear the Jaccard floor; re-joining each
    candidate to its full shingle set (setjoin._exact_verify) would
    explode to ~13M rows, while the direct postings self-join on the
    shingle is sum_sh df^2 ~ 1.1M pair-groups (shingle df <= 25
    here; a web-scale corpus would bound it with the NGRAM_DF_CAP
    discipline) and the candidate set then restricts the pair stats
    with one semi-shaped equi join. Results are identical either
    way — candidates with zero intersection can't reach a positive
    floor — so the oracle doesn't care which plan runs."""
    fps = winnow_fingerprints(docs).localCheckpoint(eager=False)
    keep = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= WINNOW_DF_CAP
    )
    pruned = fps.join(keep, "fp")
    cand_ids = (
        pruned.select(F.col("doc_id").alias("a"), "fp")
        .join(pruned.select(F.col("doc_id").alias("b"), "fp"), "fp")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    ds = _doc_shingle_sets(docs).localCheckpoint(eager=False)
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter_all = (
        ds.select(F.col("doc_id").alias("a"), "sh")
        .join(ds.select(F.col("doc_id").alias("b"), "sh"), "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter_all.join(cand_ids, ["a", "b"])
        .join(
            sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")),
            "a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")),
            "b",
        )
        .filter(
            F.lit(FLOOR_DEN + FLOOR_NUM) * F.col("inter")
            >= F.lit(FLOOR_NUM) * (F.col("na") + F.col("nb"))
        )
        .select(
            "a",
            "b",
            "inter",
            "na",
            "nb",
            F.expr("(10000 * inter) div (na + nb - inter)").alias(
                "jacc_bp"
            ),
        )
        .orderBy("a", "b")
    )


def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: winnowing-fingerprint near-dup candidates with
    exact Jaccard >= 1/20. The oracle replicates the minimizer
    selection exactly (window minima over the packed integer key,
    boundary rule included) — the gate proves the selection math;
    recall is a property test (local-match guarantee)."""
    return winnow_pairs(load(spark, sf_dir, "documents"))


QUERIES = {"dedup_winnowing": dedup_winnowing}

_TOKS = "string_split_regex(trim(text), '\\s+')"

ORACLES = {
    "dedup_winnowing": f"""
        WITH grams AS (
            SELECT doc_id, u.pos,
                   {hash64_duck("u.sh")} AS hp
            FROM (SELECT doc_id, {shingles_duck("toks", WINNOW_K)} AS arr
                  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
                 LATERAL (SELECT unnest(arr) AS sh,
                                 generate_subscripts(arr, 1) AS pos) u
        ),
        keyed AS (
            SELECT doc_id, pos,
                   hp * {_POS_PACK} + ({_POS_PACK} - pos) AS key,
                   count(*) OVER (PARTITION BY doc_id) AS m
            FROM grams
        ),
        sel AS (
            SELECT DISTINCT doc_id,
                   wmin // {_POS_PACK} AS fp
            FROM (
                SELECT doc_id, pos, m,
                       min(key) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW
                                AND {WINNOW_W - 1} FOLLOWING
                       ) AS wmin
                FROM keyed
            )
            WHERE pos <= m - {WINNOW_W - 1} OR pos = 1
        ),
        keep AS (
            SELECT fp FROM sel GROUP BY fp
            HAVING count(*) <= {WINNOW_DF_CAP}
        ),
        pruned AS (SELECT s.* FROM sel s JOIN keep USING (fp)),
        cand AS (
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM pruned x JOIN pruned y
              ON x.fp = y.fp AND x.doc_id < y.doc_id
        ),
        ds AS (
            SELECT DISTINCT doc_id, sh FROM (
                SELECT doc_id, unnest({shingles_duck("toks", 3)}) AS sh
                FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
            )
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
        inter AS (
            SELECT c.a, c.b, count(*) AS inter
            FROM cand c
            JOIN ds x ON x.doc_id = c.a
            JOIN ds y ON y.doc_id = c.b AND y.sh = x.sh
            GROUP BY c.a, c.b
        )
        SELECT i.a, i.b, i.inter, sa.n AS na, sb.n AS nb,
               (10000 * i.inter) // (sa.n + sb.n - i.inter) AS jacc_bp
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.a
        JOIN sizes sb ON sb.doc_id = i.b
        WHERE {FLOOR_DEN + FLOOR_NUM} * i.inter
              >= {FLOOR_NUM} * (sa.n + sb.n)
        ORDER BY a, b
    """,
}
