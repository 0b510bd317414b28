"""IVF (inverted-file) approximate nearest neighbor over the
`embeddings` table — the second ANN scale path next to sign-random-
projection LSH (`similarity.py`), per the builder brief ("an IVF or
LSH-bucketed variant as the scale path").

IVF-flat with deterministically seeded, Lloyd-refined centroids:

1. **Seeds** = the K vectors with the smallest portable md5 hash of
   their vec_id — a deterministic "random" sample. No RNG: Spark and
   the DuckDB oracle pick bit-identical seed sets.
2. **Lloyd refinement** (round-4): LLOYD_ITERS k-means iterations
   over the TRAIN_N smallest-hash vectors (the seeds are the first K
   of the SAME ordering — one TakeOrderedAndProject serves both).
   Cross-engine float safety: each mean is computed over INTEGER
   quantized components — sum(round(x * 1e6)) as bigint is exact and
   summation-order-independent, so both engines derive bit-identical
   centroid arrays from one IEEE division at the end; no
   float-accumulation instability to reconcile. Empty clusters keep
   their seed position. Training on a bounded hash-sample (not the
   corpus) is also the scale story: the explode+shuffle of the mean
   computation touches TRAIN_N*DIMS rows regardless of corpus size.
3. **Assignment**: every corpus vector goes to its argmax-cosine
   centroid, computed as a per-row fold against the centroid array
   (collected into ONE broadcast row, `graph.py`-style) — the corpus
   is never shuffled and never exploded K-fold.
4. **Search**: a query probes its N_PROBE nearest centroids and
   exact-cosine re-ranks ONLY those inverted lists.

100-TB shape: the centroid set is O(K) and rides a broadcast (the
refined centroids are PERSISTED per sf_dir, fingerprint-invalidated
— index CONSTRUCTION runs once per corpus, not once per query, the
way a real ANN deployment trains once and serves many); the
assignment is a narrow
projection over one corpus scan; the probe join is a broadcast hash
join (bounded query set carries its probe ids), so per-query work is
~N_PROBE/K of the corpus, never all of it, and no stage shuffles the
corpus at all — plan-asserted in tests/test_ivf.py.

Determinism: centroid scores round to 9 digits before every argmax /
ordering decision (the repo's round-before-compare convention, same
grid on both engines); displayed cosines round to 4 like the rest of
the similarity pack. Ties break toward the smaller centroid id /
neighbor id on both engines.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.textfns import hash64, hash64_duck
from ..sources.catalog import PARTITIONED_CACHE_DIR, _fingerprint_ok, load
from .similarity import (
    N_QUERIES,
    TOP_K,
    _cos_sql,
    _cosine_from,
    _dot,
    _norm,
    _with_norm,
)

#: K scales WITH the corpus (r6 VERDICT ask #4): a pinned K makes the
#: per-list population — and semdedup's within-cluster quadratic —
#: grow as N/K, a scale-killer at 100x. K = max(K_MIN,
#: ceil(N / TARGET_LIST_SIZE)) holds expected list size flat, so
#: semdedup's total pair work stays LINEAR in N (K lists x
#: (N/K)^2 = N * TARGET_LIST_SIZE). Derived with integer math from
#: the corpus count in BOTH engines (see `_k_train` / the `kt` CTE).
#: TARGET_LIST_SIZE=64 fits the synthetic corpus (500 vecs at sf0.01
#: keeps K at the K_MIN=16 floor — the driver-checked SF is
#: unchanged; 2000 at sf0.1 trains K=32); a real deployment sets it
#: per corpus profile (SemDeDup-paper scale runs 512-8192). Beyond
#: ~10^5 centroids the flat O(N*K) assign fold itself saturates and
#: the known refinement is a two-level (coarse->fine) centroid tree —
#: same assignment contract, swappable without touching callers.
K_MIN = 16
TARGET_LIST_SIZE = 64
N_PROBE = 4
LLOYD_ITERS = 2
#: training sample: TRAIN_PER_CLUSTER vectors per centroid (floored at
#: TRAIN_MIN) — k-means with corpus-scaled K needs a sample that
#: scales with K, not a fixed 256 (which starves clusters once K > 32)
TRAIN_MIN = 256
TRAIN_PER_CLUSTER = 8
_SALT = "ivf"


def _k_train(n: int) -> tuple[int, int]:
    """(K, TRAIN_N) for an n-vector corpus — pure integer math so the
    DuckDB twin (`kt` CTE) derives bit-identical values."""
    k = max(K_MIN, -(-n // TARGET_LIST_SIZE))
    return k, max(TRAIN_MIN, TRAIN_PER_CLUSTER * k)
# quantization grid for exact cross-engine centroid means: integer
# sums are order-independent, so the mean is bit-identical in Spark
# and DuckDB no matter how either engine parallelizes the aggregate
_QUANT = 1_000_000.0


def _hash_prefix(emb_n: DataFrame, n: int) -> DataFrame:
    """The n corpus vectors with the smallest hash64('ivf', vec_id):
    deterministic sample, TakeOrderedAndProject (no full sort)."""
    return (
        emb_n.withColumn(
            "hk", hash64(F.col("vec_id").cast("string"), _SALT)
        )
        .orderBy("hk", "vec_id")
        .limit(n)
        .drop("hk")
    )


def _centroids(emb_n: DataFrame, k: int | None = None) -> DataFrame:
    """Seed centroids: the K smallest-hash vectors (the first K of the
    SAME ordering the training sample uses), as double arrays so Lloyd
    means can coalesce onto them type-stably. k=None derives the
    corpus-scaled K (one count job — index-construction-time only)."""
    if k is None:
        k, _ = _k_train(emb_n.count())
    return _hash_prefix(emb_n, k).select(
        F.col("vec_id").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cemb"),
        F.col("norm").alias("cnorm"),
    )


def _lloyd(
    emb_n: DataFrame, cents: DataFrame, train_n: int = TRAIN_MIN
) -> DataFrame:
    """LLOYD_ITERS k-means refinements of `cents` over the train_n
    smallest-hash training vectors. Per iteration: fold-assign the
    training set to its argmax-cosine centroid (same kernel the corpus
    assignment uses), then per-centroid dimension-wise means over
    integer-quantized components — sum(round(x*1e6)) is exact, so both
    engines produce bit-identical centroids from one IEEE division.
    Empty clusters keep their previous position. The posexplode
    touches train_n*dims rows (bounded: train_n tracks K, not the
    corpus) and its groupBy partial-aggregates to K*dims per
    partition."""
    train = _hash_prefix(emb_n, train_n)
    for _ in range(LLOYD_ITERS):
        assigned = _assigned(train, _centroid_row(cents))
        sums = (
            assigned.select(
                "centroid_id",
                F.posexplode(
                    F.transform(
                        "embedding",
                        lambda x: F.round(x.cast("double") * F.lit(_QUANT))
                        .cast("long"),
                    )
                ).alias("dim", "q"),
            )
            .groupBy("centroid_id", "dim")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("c"))
        )
        means = (
            sums.select(
                "centroid_id",
                F.struct(
                    "dim",
                    (
                        F.col("s").cast("double") / (F.lit(_QUANT) * F.col("c"))
                    ).alias("m"),
                ).alias("dm"),
            )
            .groupBy(F.col("centroid_id").alias("cid"))
            .agg(F.array_sort(F.collect_list("dm")).alias("dms"))
            .select(
                "cid", F.transform("dms", lambda s: s["m"]).alias("mem")
            )
        )
        cents = (
            cents.join(means, "cid", "left")
            .select("cid", F.coalesce("mem", "cemb").alias("cemb"))
            .select("cid", "cemb", _norm(F.col("cemb")).alias("cnorm"))
        )
    return cents


def _build_centroids(emb_n: DataFrame) -> DataFrame:
    """Index CONSTRUCTION: the Lloyd-refined centroid table, with K
    and the training-sample size derived from the corpus count. Runs
    the full training pipeline — callers want `_index_centroids`,
    which persists this result per sf_dir."""
    k, train_n = _k_train(emb_n.count())
    return _lloyd(emb_n, _centroids(emb_n, k), train_n)


def _cents_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("cid", T.LongType()),
            T.StructField("cemb", T.ArrayType(T.DoubleType())),
            T.StructField("cnorm", T.DoubleType()),
        ]
    )


#: bump to invalidate persisted centroid caches when index-build
#: semantics change (v2 = corpus-scaled K and training-sample size)
INDEX_VERSION = 2

_CACHE_DIR = PARTITIONED_CACHE_DIR.replace("events_by_date", "ivf_centroids")


def _index_centroids(
    spark: SparkSession, sf_dir: str, emb_n: DataFrame
) -> DataFrame:
    """The built index: Lloyd-refined centroids, PERSISTED once per
    sf_dir (fingerprint of the source embeddings file + training
    params invalidates the cache). Index construction is one-time
    ETL — a real ANN deployment trains once and serves many queries
    from the stored index; before this cache every IVF-family query
    (both ivf queries, both semdedup queries) re-ran the ~5 s
    training pipeline per call, ~6x the cost of the assignment scan
    it feeds. Downstream search plans read a 16-row parquet and stay
    shuffle- and Generate-free over the corpus (plan-asserted)."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    path = os.path.join(
        _CACHE_DIR, os.path.basename(os.path.normpath(sf_dir))
    )
    marker = os.path.join(path, "_FINGERPRINT.json")
    st = os.stat(src)
    fp = {
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
        "index_version": INDEX_VERSION,
        "params": [
            K_MIN,
            TARGET_LIST_SIZE,
            LLOYD_ITERS,
            TRAIN_MIN,
            TRAIN_PER_CLUSTER,
        ],
    }
    if not _fingerprint_ok(marker, fp):
        _build_centroids(emb_n).write.mode("overwrite").parquet(path)
        with open(marker, "w") as f:
            json.dump(fp, f)
    return spark.read.schema(_cents_schema()).parquet(path)


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
        _assigned(emb_n, _centroid_row(_index_centroids(spark, sf_dir, emb_n)))
        .select(
            "vec_id",
            "centroid_id",
            F.round(F.col("score9"), 4).alias("cos_c"),
        )
        .orderBy("vec_id")
    )


_LISTS_DIR = PARTITIONED_CACHE_DIR.replace("events_by_date", "ivf_lists")


def _lists_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("norm", T.DoubleType()),
            T.StructField("centroid_id", T.LongType()),
        ]
    )


def inverted_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverted lists themselves, persisted as parquet
    PARTITIONED BY centroid_id — the on-disk layout a real IVF index
    uses: a probe of N_PROBE lists reads N_PROBE partition
    directories and nothing else (PartitionFilters, not a full-corpus
    scan). Fingerprint-invalidated like the centroid cache."""
    emb_n = _with_norm(load(spark, sf_dir, "embeddings"))
    cents = _index_centroids(spark, sf_dir, emb_n)
    src = os.path.join(sf_dir, "embeddings.parquet")
    path = os.path.join(
        _LISTS_DIR, os.path.basename(os.path.normpath(sf_dir))
    )
    marker = os.path.join(path, "_FINGERPRINT.json")
    st = os.stat(src)
    fp = {
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
        "index_version": INDEX_VERSION,
        "params": [
            K_MIN,
            TARGET_LIST_SIZE,
            LLOYD_ITERS,
            TRAIN_MIN,
            TRAIN_PER_CLUSTER,
        ],
    }
    if not _fingerprint_ok(marker, fp):
        (
            _assigned(emb_n, _centroid_row(cents))
            .select("vec_id", "embedding", "norm", "centroid_id")
            .repartition("centroid_id")
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(path)
        )
        with open(marker, "w") as f:
            json.dump(fp, f)
    return spark.read.schema(_lists_schema()).parquet(path)


def topk_for(
    spark: SparkSession,
    sf_dir: str,
    queries: DataFrame,
    exclude_self: bool = False,
    lists: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k for an arbitrary bounded query frame
    (query_id, embedding) — the SERVING entry: each query probes its
    N_PROBE nearest centroid lists in the persisted index and
    exact-cosine re-ranks only those candidates. The query side is
    broadcast (bounded by contract: a micro-batch, a user request
    set); the corpus side is the partitioned lists scan, pruned to
    the probed centroid directories. `exclude_self` drops
    neighbor_id == query_id matches for self-query demos; `lists`
    substitutes a caller-maintained lists frame (e.g. the streaming
    ingest's growing index) for the per-sf_dir corpus cache."""
    emb_n = _with_norm(load(spark, sf_dir, "embeddings"))
    cents_row = _centroid_row(_index_centroids(spark, sf_dir, emb_n))
    if lists is None:
        lists = inverted_lists(spark, sf_dir)
    corpus = lists.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("norm").alias("nn"),
        "centroid_id",
    )
    q = queries.select(
        "query_id",
        F.col("embedding").alias("qe"),
        _norm(F.col("embedding")).alias("qn"),
    )
    # desc-sorted scored array -> first N_PROBE centroid ids
    probe_cids = F.transform(
        F.slice(
            F.reverse(
                F.array_sort(_scored_cents(F.col("qe"), F.col("qn")))
            ),
            1,
            N_PROBE,
        ),
        lambda s: -s["ncid"],
    )
    probes = q.crossJoin(F.broadcast(cents_row)).select(
        "query_id",
        "qe",
        "qn",
        F.explode(probe_cids).alias("centroid_id"),
    )
    cos = _cosine_from(
        _dot(F.col("qe"), F.col("ne")), F.col("qn"), F.col("nn")
    )
    scored = corpus.join(F.broadcast(probes), "centroid_id")
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.select(
        "query_id", "neighbor_id", F.round(cos, 4).alias("cos")
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


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k through the inverted file: each query (vec_id <
    N_QUERIES) probes its N_PROBE nearest centroid lists and
    exact-cosine re-ranks only those candidates. A thin wrapper over
    `topk_for`, the general serving entry."""
    emb_n = _with_norm(load(spark, sf_dir, "embeddings"))
    queries = emb_n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return topk_for(spark, sf_dir, queries, exclude_self=True)


QUERIES = {
    "sim_ivf_assign": sim_ivf_assign,
    "sim_ivf_topk": sim_ivf_topk,
}

# ---- DuckDB twins -------------------------------------------------


def _lloyd_ctes() -> str:
    """CTE chain replaying seed sampling + LLOYD_ITERS unrolled
    k-means rounds, ending in `cents(cid, cemb)`. Mirrors _lloyd()
    decision-for-decision: score9 argmax assignment, integer-quantized
    exact means, empty clusters coalesce to their previous position."""
    parts = [
        f"""
        kt AS (
            SELECT greatest({K_MIN},
                       (count(*) + {TARGET_LIST_SIZE - 1})
                           // {TARGET_LIST_SIZE}) AS k,
                   greatest({TRAIN_MIN},
                       {TRAIN_PER_CLUSTER}
                           * greatest({K_MIN},
                                 (count(*) + {TARGET_LIST_SIZE - 1})
                                     // {TARGET_LIST_SIZE})) AS tn
            FROM embeddings
        ),
        ordv AS (
            SELECT vec_id, embedding,
                   row_number() OVER (ORDER BY
                       {hash64_duck("CAST(vec_id AS VARCHAR)", f"'{_SALT}'")},
                       vec_id) AS hrn
            FROM embeddings
        ),
        train AS (
            SELECT vec_id, embedding FROM ordv
            WHERE hrn <= (SELECT tn FROM kt)
        ),
        cents_0 AS (
            SELECT vec_id AS cid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cemb
            FROM ordv WHERE hrn <= (SELECT k FROM kt)
        )"""
    ]
    for i in range(LLOYD_ITERS):
        parts.append(
            f"""
        sc_{i} AS (
            SELECT t.vec_id, c.cid,
                   {_cos_sql("t.embedding", "c.cemb", 9)} AS score9
            FROM train t, cents_{i} c
        ),
        asg_{i} AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (
                           PARTITION BY vec_id
                           ORDER BY score9 DESC, cid ASC) AS rn
                FROM sc_{i} WHERE score9 IS NOT NULL
            ) WHERE rn = 1
        ),
        sums_{i} AS (
            SELECT a.cid, d.dim,
                   CAST(sum(CAST(round(CAST(t.embedding[d.dim + 1] AS DOUBLE)
                                       * {_QUANT}) AS BIGINT)) AS BIGINT) AS s,
                   count(*) AS c
            FROM asg_{i} a
            JOIN train t USING (vec_id),
                 (SELECT unnest(range(64)) AS dim) d
            GROUP BY a.cid, d.dim
        ),
        means_{i} AS (
            SELECT cid,
                   list(CAST(s AS DOUBLE) / ({_QUANT} * c) ORDER BY dim)
                       AS cemb
            FROM sums_{i} GROUP BY cid
        ),
        cents_{i + 1} AS (
            SELECT c0.cid, coalesce(m.cemb, c0.cemb) AS cemb
            FROM cents_{i} c0 LEFT JOIN means_{i} m USING (cid)
        )"""
        )
    parts.append(f"cents AS (SELECT cid, cemb FROM cents_{LLOYD_ITERS})")
    return ",".join(parts)


_CENTS_CTES = _lloyd_ctes()

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
        WITH {_CENTS_CTES},
        scored AS ({_SCORED}),
        assign AS ({_ASSIGN})
        SELECT vec_id, cid AS centroid_id, round(score9, 4) AS cos_c
        FROM assign WHERE rn = 1
        ORDER BY vec_id
    """,
    "sim_ivf_topk": f"""
        WITH {_CENTS_CTES},
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
