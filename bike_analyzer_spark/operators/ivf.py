"""IVF (inverted-file) approximate nearest neighbor over the
`embeddings` table — the second ANN scale path next to sign-random-
projection LSH (`similarity.py`), per the builder brief ("an IVF or
LSH-bucketed variant as the scale path").

IVF-flat with deterministically sampled centroids:

1. **Centroids** = the K vectors with the smallest portable md5 hash
   of their vec_id — a deterministic "random" sample. No RNG and no
   Lloyd iterations, so there is no float-accumulation instability to
   reconcile across engines: Spark and the DuckDB oracle pick
   bit-identical centroid sets.
2. **Assignment**: every corpus vector goes to its argmax-cosine
   centroid, computed as a per-row fold against the centroid array
   (collected into ONE broadcast row, `graph.py`-style) — the corpus
   is never shuffled and never exploded K-fold.
3. **Search**: a query probes its N_PROBE nearest centroids and
   exact-cosine re-ranks ONLY those inverted lists.

100-TB shape: the centroid set is O(K) and rides a broadcast; the
assignment is a narrow projection over one corpus scan; the probe
join is a broadcast hash join (bounded query set carries its probe
ids), so per-query work is ~N_PROBE/K of the corpus, never all of it,
and no stage shuffles the corpus at all — plan-asserted in
tests/test_ivf.py.

Determinism: centroid scores round to 9 digits before every argmax /
ordering decision (the repo's round-before-compare convention, same
grid on both engines); displayed cosines round to 4 like the rest of
the similarity pack. Ties break toward the smaller centroid id /
neighbor id on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import hash64, hash64_duck
from ..sources.catalog import load
from .similarity import (
    N_QUERIES,
    TOP_K,
    _cos_sql,
    _cosine_from,
    _dot,
    _with_norm,
)

K_CENTROIDS = 16
N_PROBE = 4
_SALT = "ivf"


def _centroids(emb_n: DataFrame) -> DataFrame:
    """The K corpus vectors with the smallest hash64('ivf', vec_id):
    deterministic sample, TakeOrderedAndProject (no full sort)."""
    return (
        emb_n.withColumn(
            "hk", hash64(F.col("vec_id").cast("string"), _SALT)
        )
        .orderBy("hk", "vec_id")
        .limit(K_CENTROIDS)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cemb"),
            F.col("norm").alias("cnorm"),
        )
    )


def _centroid_row(cents: DataFrame) -> DataFrame:
    """All centroids folded into ONE row (array sorted by cid, so the
    fold order is deterministic) — the broadcastable form."""
    return cents.agg(
        F.sort_array(
            F.collect_list(F.struct("cid", "cemb", "cnorm"))
        ).alias("cents")
    )


def _scored_cents(vec: Column, norm: Column) -> Column:
    """array<struct(score, ncid)> of this row's cosine to every
    centroid; score pre-rounded to 9, ncid = -cid so that struct
    ordering (score asc, ncid asc) makes the array MAX the best
    centroid with ties toward the SMALLEST cid. NULL scores (zero-norm
    vectors) are dropped so they can't poison the struct ordering."""
    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            F.round(
                _cosine_from(_dot(vec, c["cemb"]), norm, c["cnorm"]), 9
            ).alias("score"),
            (-c["cid"]).alias("ncid"),
        ),
    )
    return F.filter(scored, lambda s: s["score"].isNotNull())


def _assigned(emb_n: DataFrame, cents_row: DataFrame) -> DataFrame:
    """(vec_id, embedding, norm, centroid_id, score9): each vector's
    argmax-cosine centroid via one narrow fold — no corpus shuffle."""
    best = F.array_max(_scored_cents(F.col("embedding"), F.col("norm")))
    return (
        emb_n.crossJoin(F.broadcast(cents_row))
        .select(
            "vec_id",
            "embedding",
            "norm",
            (-best["ncid"]).alias("centroid_id"),
            best["score"].alias("score9"),
        )
        .filter(F.col("centroid_id").isNotNull())
    )


def sim_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverted-file index itself: every vector's nearest centroid
    (the list it files under) and its cosine to it."""
    emb_n = _with_norm(load(spark, sf_dir, "embeddings"))
    return (
        _assigned(emb_n, _centroid_row(_centroids(emb_n)))
        .select(
            "vec_id",
            "centroid_id",
            F.round(F.col("score9"), 4).alias("cos_c"),
        )
        .orderBy("vec_id")
    )


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k through the inverted file: each query (vec_id <
    N_QUERIES) probes its N_PROBE nearest centroid lists and
    exact-cosine re-ranks only those candidates."""
    emb_n = _with_norm(load(spark, sf_dir, "embeddings"))
    cents_row = _centroid_row(_centroids(emb_n))
    corpus = _assigned(emb_n, cents_row).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("norm").alias("nn"),
        "centroid_id",
    )
    # desc-sorted scored array -> first N_PROBE centroid ids
    probe_cids = F.transform(
        F.slice(
            F.reverse(
                F.array_sort(
                    _scored_cents(F.col("embedding"), F.col("norm"))
                )
            ),
            1,
            N_PROBE,
        ),
        lambda s: -s["ncid"],
    )
    probes = (
        emb_n.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cents_row))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("norm").alias("qn"),
            F.explode(probe_cids).alias("centroid_id"),
        )
    )
    cos = _cosine_from(
        _dot(F.col("qe"), F.col("ne")), F.col("qn"), F.col("nn")
    )
    scored = (
        corpus.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, 4).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank")
    )


QUERIES = {
    "sim_ivf_assign": sim_ivf_assign,
    "sim_ivf_topk": sim_ivf_topk,
}

# ---- DuckDB twins -------------------------------------------------

_CENTS = f"""
        SELECT vec_id AS cid, embedding AS cemb
        FROM embeddings
        ORDER BY {hash64_duck("CAST(vec_id AS VARCHAR)", f"'{_SALT}'")},
                 vec_id
        LIMIT {K_CENTROIDS}
"""

# cosine of every (vector, centroid) pair, rounded to the same
# 9-digit grid the Spark fold uses before any argmax decision
_SCORED = f"""
        SELECT e.vec_id, c.cid,
               {_cos_sql("e.embedding", "c.cemb", 9)} AS score9
        FROM embeddings e, cents c
"""

_ASSIGN = """
        SELECT vec_id, cid, score9,
               row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY score9 DESC, cid ASC) AS rn
        FROM scored
        WHERE score9 IS NOT NULL
"""

ORACLES = {
    "sim_ivf_assign": f"""
        WITH cents AS ({_CENTS}),
        scored AS ({_SCORED}),
        assign AS ({_ASSIGN})
        SELECT vec_id, cid AS centroid_id, round(score9, 4) AS cos_c
        FROM assign WHERE rn = 1
        ORDER BY vec_id
    """,
    "sim_ivf_topk": f"""
        WITH cents AS ({_CENTS}),
        scored AS ({_SCORED}),
        assign AS ({_ASSIGN}),
        probes AS (
            SELECT vec_id AS query_id, cid
            FROM assign
            WHERE vec_id < {N_QUERIES} AND rn <= {N_PROBE}
        ),
        cand AS (
            SELECT p.query_id, a.vec_id AS neighbor_id
            FROM probes p
            JOIN (SELECT vec_id, cid FROM assign WHERE rn = 1) a
              ON a.cid = p.cid
            WHERE a.vec_id != p.query_id
        ),
        rescored AS (
            SELECT c.query_id, c.neighbor_id,
                   {_cos_sql("qe.embedding", "ne.embedding")} AS cos
            FROM cand c
            JOIN embeddings qe ON qe.vec_id = c.query_id
            JOIN embeddings ne ON ne.vec_id = c.neighbor_id
        )
        SELECT query_id, neighbor_id, cos, CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM rescored
        )
        WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """,
}
