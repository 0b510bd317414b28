"""SemDeDup-style semantic deduplication over the `embeddings` table
— the cluster-then-prune near-duplicate pass a large-scale training
pipeline runs AFTER lexical dedup (Abbas et al. 2023, "SemDeDup":
k-means the embedding space, then compare pairs only WITHIN each
cluster, since semantic duplicates land in the same cluster).

This composes the repo's existing IVF machinery (`ivf.py`: seeded,
Lloyd-refined, integer-exact centroids; fold-based argmax assignment
with no corpus shuffle/explode) with one equi self-join on the
cluster id:

1. cluster: every vector's argmax-cosine centroid (shared with
   `sim_ivf_assign`, so the index is built once per plan and both
   operators agree on the partitioning of the space);
2. prune: within a cluster, vector b is DROPPED when some vector a in
   the same cluster has round(cos(a,b), 9) >= SEM_TAU and a
   "dominates" b — a sits closer to the centroid (higher score9), or
   equally close with the smaller vec_id. Keeping the
   closest-to-centroid member per duplicate neighborhood is the
   SemDeDup paper's low-variance keeper rule, made deterministic with
   the repo's round-before-compare + smaller-id tie-break convention.
   The rule is single-step (dominance, not transitive cascade), so
   both engines can evaluate it as one EXISTS — no iteration.

100-TB shape: the only corpus shuffle is the self-join's hash
exchange on centroid_id; pairwise cosine work is quadratic ONLY
within a cluster (expected cluster size N/K — exactly the cost model
that makes SemDeDup tractable where all-pairs is not), per-pair cost
is a 64-dim JVM fold, and skewed clusters re-split under AQE skew
join. K GROWS with the corpus (ivf._k_train: K = max(16,
ceil(N / TARGET_LIST_SIZE)), derived identically in both engines),
holding expected cluster size — and thus per-cluster quadratic cost
— flat: total pair work is K x (N/K)^2 = N x TARGET_LIST_SIZE,
linear in N.

Reference scope note: the reference engine has no embedding/ANN
surface at all; this extends the builder brief's dedup family
(exact -> MinHash -> SimHash -> embedding-cosine -> semantic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load
from .ivf import _ASSIGN, _CENTS_CTES, _SCORED, _assigned, _centroid_row, _index_centroids
from .similarity import _cos_sql, _cosine_from, _dot, _with_norm

#: round-9 cosine at or above which two same-cluster vectors are
#: semantic duplicates. SemDeDup tunes tau to a target REMOVAL RATE
#: (the paper sweeps it per corpus); the synthetic embeddings are
#: near-orthogonal random vectors (max pairwise cos 0.51, p99 0.29 at
#: sf0.01), so the demo tau sits inside that band — ~14% removal —
#: to keep the prune path non-degenerate. Real text embeddings
#: cluster much tighter and would run at 0.95+.
SEM_TAU = 0.35


def _clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, norm, centroid_id, score9): the IVF
    assignment, shared verbatim with sim_ivf_assign.

    Lazily checkpointed: the prune consumes the assignment THREE
    times (both sides of the pair join + the verdict join), and
    without materialization Spark would rerun the corpus scan and
    centroid fold per consumer — plan-audited; at scale this frame
    IS the cluster index a real deployment persists once."""
    emb_n = _with_norm(load(spark, sf_dir, "embeddings"))
    return _assigned(
        emb_n, _centroid_row(_index_centroids(spark, sf_dir, emb_n))
    ).localCheckpoint(eager=False)


def _with_keep(a: DataFrame) -> DataFrame:
    """Append the SemDeDup keep flag to an assignment frame."""
    left = a.select(
        "centroid_id",
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("ae"),
        F.col("norm").alias("an"),
        F.col("score9").alias("a_s"),
    )
    right = a.select(
        "centroid_id",
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("be"),
        F.col("norm").alias("bn"),
        F.col("score9").alias("b_s"),
    )
    dominates = (F.col("a_s") > F.col("b_s")) | (
        (F.col("a_s") == F.col("b_s")) & (F.col("a_id") < F.col("b_id"))
    )
    cos9 = F.round(
        _cosine_from(_dot(F.col("ae"), F.col("be")), F.col("an"), F.col("bn")),
        9,
    )
    dropped = (
        left.join(right, "centroid_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(dominates & (cos9 >= F.lit(SEM_TAU)))
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )
    return a.join(dropped, "vec_id", "left").withColumn(
        "keep", F.col("_dropped").isNull()
    )


def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector SemDeDup verdict: its cluster and whether it
    survives the within-cluster semantic prune."""
    return (
        _with_keep(_clustered(spark, sf_dir))
        .select("vec_id", "centroid_id", "keep")
        .orderBy("vec_id")
    )


def semdedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster prune report — the number a curation run reads to
    see which regions of embedding space are duplicate-heavy."""
    return (
        _with_keep(_clustered(spark, sf_dir))
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_dropped"),
        )
        .withColumn(
            "drop_ratio",
            F.round(F.col("n_dropped") / F.col("n_vecs"), 4),
        )
        .orderBy("centroid_id")
    )


QUERIES = {
    "semdedup_keep": semdedup_keep,
    "semdedup_summary": semdedup_summary,
}

# ---- DuckDB twins -------------------------------------------------

#: the shared assignment + dominance-prune CTE chain, ending in
#: `verdict(vec_id, centroid_id, keep)`
_VERDICT_CTES = f"""
    WITH {_CENTS_CTES},
    scored AS ({_SCORED}),
    assign AS ({_ASSIGN}),
    a AS (SELECT vec_id, cid, score9 FROM assign WHERE rn = 1),
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM a x
        JOIN a b ON x.cid = b.cid AND x.vec_id != b.vec_id
        JOIN embeddings ea ON ea.vec_id = x.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
        WHERE (x.score9 > b.score9
               OR (x.score9 = b.score9 AND x.vec_id < b.vec_id))
          AND {_cos_sql("ea.embedding", "eb.embedding", 9)} >= {SEM_TAU}
    ),
    verdict AS (
        SELECT a.vec_id, a.cid AS centroid_id,
               d.vec_id IS NULL AS keep
        FROM a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    )
"""

ORACLES = {
    "semdedup_keep": f"""
        {_VERDICT_CTES}
        SELECT vec_id, centroid_id, keep FROM verdict ORDER BY vec_id
    """,
    "semdedup_summary": f"""
        {_VERDICT_CTES}
        SELECT centroid_id, count(*) AS n_vecs,
               CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_dropped,
               round(CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                     / count(*), 4) AS drop_ratio
        FROM verdict GROUP BY centroid_id ORDER BY centroid_id
    """,
}
