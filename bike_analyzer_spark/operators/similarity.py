"""Similarity search over the `embeddings` table (array<float>, 64-d)
— the LLM-data-pipeline ANN pack.

Two paths, as the brief prescribes:
- brute-force cosine top-k as the correctness baseline: a bounded
  query set is broadcast against the corpus; the dot product and norms
  are native `zip_with`/`aggregate` folds (JVM codegen, no UDF).
- sign-random-projection LSH (T tables x H hyperplanes) as the scale
  path: each vector lands in T buckets; candidates share a bucket.
  At 100 TB the corpus-side work is a single narrow scan + explode to
  T rows, shuffled once by (table, bucket) — never |corpus|^2.

Cross-engine determinism: hyperplane weights are +/-1 derived from the
portable md5-prefix hash of (table, plane, dim) — no RNG, so Spark and
the DuckDB oracle build bit-identical planes. All arithmetic is done
in float64 after casting the float32 inputs up, with identical
operation order on both engines.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from ..functions.textfns import hash64_duck
from ..sources.catalog import load

N_QUERIES = 8  # brute-force demo query set: vec_id < 8
TOP_K = 3
LSH_TABLES = 4
# 8 bits/table = 256 buckets: for uncorrelated vectors P(same bucket)
# ~= 0.5^8, keeping the candidate self-join ~|corpus|^2/256 per table
# instead of /16 (measured 11s -> ~2s at sf0.1); near-identical
# vectors still collide with high probability per table.
LSH_PLANES = 8  # bits per table


def _dot(a, b):
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _cosine_from(dot, na, nb):
    """cos = dot / (||a||*||b||), with the zero-norm product NULLed so
    a degenerate all-zero embedding yields NULL on BOTH engines (Spark
    non-ANSI x/0.0 is NULL; DuckDB IEEE division is inf/NaN — nullif
    on each side keeps the oracle hash stable)."""
    return dot / F.nullif(na * nb, F.lit(0.0))


def _with_norm(emb: DataFrame) -> DataFrame:
    """Precompute ||v|| once per vector: in pair-scoring joins each
    vector participates in many pairs, so folding the norm per PAIR
    repeats identical work; the precomputed double is bit-identical
    to the inline fold (same sequential fold, same array)."""
    return emb.select("vec_id", "embedding", _norm(F.col("embedding")).alias("norm"))


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for a bounded query set.

    The query side (vec_id < N_QUERIES) is tiny and broadcast; the
    corpus side streams through one scan. Ranking ties break on the
    ROUNDED score then neighbor id so both engines order identically.
    """
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qn"),
    )
    cos = _cosine_from(
        _dot(F.col("qe"), F.col("embedding")), F.col("qn"), F.col("norm")
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.round(cos, 4))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos")
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


def _plane_sign(t: int, h: int, d: int) -> float:
    """Driver-side mirror of the portable md5-prefix sign derivation
    (same bytes Spark's md5(concat_ws(',',t,h,d)) and the DuckDB
    oracle hash — parity is pinned by test_plane_signs_match_lattice).
    """
    hexpfx = hashlib.md5(f"{t},{h},{d}".encode()).hexdigest()[:8]
    return float((int(hexpfx, 16) % 2) * 2 - 1)


# 32 deterministic +/-1 hyperplanes, materialized ONCE at import as
# plain Python floats — they become literal arrays in the plan, so the
# projection is a per-row fold with NO plane join and NO shuffle.
PLANE_SIGNS: list[list[list[float]]] = [
    [[_plane_sign(t, h, d) for d in range(64)] for h in range(LSH_PLANES)]
    for t in range(LSH_TABLES)
]


def lsh_plane_signs(spark: SparkSession) -> DataFrame:
    """The (table, plane, dim) -> +/-1 weight lattice derived inside
    Spark — kept as the parity witness for PLANE_SIGNS (the operators
    themselves use the literal arrays and never run this)."""
    t = spark.range(LSH_TABLES).select(F.col("id").alias("t"))
    h = spark.range(LSH_PLANES).select(F.col("id").alias("h"))
    d = spark.range(64).select(F.col("id").alias("d"))
    key = F.concat_ws(",", "t", "h", "d")
    sign = (
        F.conv(F.substring(F.md5(F.encode(key, "UTF-8")), 1, 8), 16, 10)
        .cast("bigint")
        % 2
    ) * 2 - 1
    return t.crossJoin(h).crossJoin(d).select(
        "t", "h", "d", sign.cast("double").alias("sign")
    )


def _bucket_bits(t: int):
    """Bucket id for table t as a single per-row expression: bit h is
    [round(dot(v, plane_th), 9) >= 0]. The round-before-sign mirrors
    the oracle so a projection within float noise of 0 cannot flip a
    bit on one engine only."""
    bits = F.lit(0)
    for h in range(LSH_PLANES):
        # one array Literal node per plane (not CreateArray of 64
        # scalar literals) — keeps the Catalyst tree small
        plane = F.lit(PLANE_SIGNS[t][h])
        prod = F.zip_with(
            F.col("embedding"), plane, lambda x, s: x.cast("double") * s
        )
        dot = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
        bits = bits + F.when(F.round(dot, 9) >= 0, F.lit(1 << h)).otherwise(
            F.lit(0)
        )
    return bits.cast("int")


# (64 dims x 32 planes) constant projection matrix, tables-major on
# the plane axis (column t*LSH_PLANES + h), and the per-plane bit
# weights — module constants so every Arrow batch reuses them.
_PLANES_MAT = (
    np.array(PLANE_SIGNS, dtype=np.float64)
    .reshape(LSH_TABLES * LSH_PLANES, 64)
    .T
)
_BIT_WEIGHTS = 1 << np.arange(LSH_PLANES, dtype=np.int64)


@F.pandas_udf(ArrayType(IntegerType()))
def _bucket_vec(emb: pd.Series) -> pd.Series:
    """All LSH_TABLES bucket ids for a batch of embeddings in one
    vectorized matmul: (n x 64) @ (64 x 32) -> sign bits -> 4 bucket
    ints per row. Arrow-batched, constant memory per batch, and the
    round(.,9)-before-sign mirrors the oracle (accumulation-order
    float noise cannot flip a bit on one engine only — the BLAS dot,
    the Spark fold and the DuckDB sum all round to the same grid).
    Numeric parity with the pure-column `_bucket_bits` fold is pinned
    by test_bucket_vec_matches_fold."""
    if len(emb) == 0:
        return pd.Series([], dtype=object)
    x = np.vstack(emb.to_numpy()).astype(np.float64)
    proj = np.round(x @ _PLANES_MAT, 9)
    bits = (proj >= 0).astype(np.int64).reshape(-1, LSH_TABLES, LSH_PLANES)
    buckets = bits @ _BIT_WEIGHTS
    return pd.Series(list(buckets.astype(np.int32)))


def _lsh_buckets(emb: DataFrame) -> DataFrame:
    """(vec_id, table_id, bucket) via a narrow projection: one
    Arrow-batched matmul against the LITERAL plane matrix — zero
    joins, zero shuffles, T output rows per vector via one inline
    posexplode. (The round-2 posexplode x plane-lattice join paid
    ~2048 intermediate rows and two groupBy shuffles per vector; the
    interpreted zip_with/aggregate fold `_bucket_bits` is JVM-side but
    non-codegen and ~10x slower than BLAS on this dense kernel, so it
    remains as the parity witness only.)"""
    return emb.select(
        "vec_id", F.posexplode(_bucket_vec("embedding")).alias("table_id", "bucket")
    ).select(
        "vec_id", F.col("table_id").cast("bigint").alias("table_id"), "bucket"
    )


def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection bucket per (vector, table): bit h of the
    bucket is [dot(v, plane_th) >= 0]. Presentation sort only — the
    candidate pipeline consumes the unsorted narrow form."""
    return _lsh_buckets(load(spark, sf_dir, "embeddings")).orderBy(
        "vec_id", "table_id"
    )


def _scored_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs sharing any (table, bucket), scored with exact
    cosine — the shared core of sim_lsh_candidates and
    dedup_embed_cosine."""
    # materialized once: the bucket projection (a per-row matmul fold)
    # feeds both sides of the candidate self-join
    buckets = _lsh_buckets(
        load(spark, sf_dir, "embeddings")
    ).localCheckpoint(eager=False)
    l, r = buckets.alias("l"), buckets.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.table_id") == F.col("r.table_id"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("a"), F.col("r.vec_id").alias("b"))
        .distinct()
    )
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    ea = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"),
                    F.col("norm").alias("na"))
    eb = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"),
                    F.col("norm").alias("nb"))
    cos = _cosine_from(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
    return (
        cands.join(ea, "a")
        .join(eb, "b")
        .select("a", "b", F.round(cos, 4).alias("cos"))
    )


def sim_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs = vectors sharing any (table, bucket); verified
    with exact cosine. The scale-path near-dup/ANN primitive."""
    return _scored_lsh_pairs(spark, sf_dir).orderBy(
        F.desc("cos"), "a", "b"
    ).limit(50)


NEAR_DUP_COS = 0.95


def sim_mutual_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL nearest neighbors within the LSH candidate space — the
    reciprocal-top-1 pairing primitive (bitext mining / dataset
    linkage: a pair only counts when each vector is the OTHER's best
    match, which suppresses hub vectors that are everyone's neighbor
    but nobody's partner).

    Plan: the shared LSH-bucketed candidate pairs (never all-pairs),
    doubled into directed edges, one argmax window per vector
    (partition = vec_id, bounded by the vector's candidate degree),
    then a self-join keeping edges whose reverse is also rank 1.
    Ties break (cos desc, neighbor asc) on the ROUNDED score so both
    engines pick the same neighbor; null-cos edges (zero-norm
    vectors) are excluded on both engines before ranking.

    Scale: candidate generation is the pinned LSH machinery
    (sum-over-buckets fan-out); ranking shuffles once on vec_id; the
    mutual join is NN-sized (one row per vector). Approximate by
    construction — mutual-within-candidates — and the oracle replays
    the same candidate space exactly."""
    pairs = _scored_lsh_pairs(spark, sf_dir).localCheckpoint(eager=False)
    directed = (
        pairs.select(F.col("a").alias("v"), F.col("b").alias("n"), "cos")
        .unionByName(
            pairs.select(
                F.col("b").alias("v"), F.col("a").alias("n"), "cos"
            )
        )
        .filter(F.col("cos").isNotNull())
    )
    w = Window.partitionBy("v").orderBy(F.desc("cos"), F.asc("n"))
    nn = (
        directed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("v", "n", "cos")
        .localCheckpoint(eager=False)
    )
    x, y = nn.alias("x"), nn.alias("y")
    return (
        x.join(
            y,
            (F.col("x.v") == F.col("y.n"))
            & (F.col("x.n") == F.col("y.v"))
            & (F.col("x.v") < F.col("x.n")),
        )
        .select(
            F.col("x.v").alias("a"),
            F.col("x.n").alias("b"),
            F.col("x.cos").alias("cos"),
        )
        .orderBy("a")
    )


def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection (the dedup pack's
    vector modality): LSH-bucketed candidates verified at a high
    cosine threshold. Empty on decorrelated corpora — by design; the
    oracle runs the same bucketed pipeline, so emptiness is verified,
    not assumed."""
    return (
        _scored_lsh_pairs(spark, sf_dir)
        .filter(F.col("cos") >= NEAR_DUP_COS)
        .orderBy(F.desc("cos"), "a", "b")
    )


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_lsh_buckets": sim_lsh_buckets,
    "sim_lsh_candidates": sim_lsh_candidates,
    "dedup_embed_cosine": dedup_embed_cosine,
    "sim_mutual_nn": sim_mutual_nn,
}

# DuckDB twins. Element access: list_transform((x,i) -> ...) gives a
# 1-based index i, matching Spark's posexplode d via i = d + 1.
_COS = """
        round(
            list_sum(list_transform(list_zip(__A__, __B__),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            / nullif(sqrt(list_sum(list_transform(__A__,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(__B__,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 0.0), __D__)
"""


def _cos_sql(a: str, b: str, digits: int = 4) -> str:
    return (
        _COS.replace("__A__", a).replace("__B__", b).replace("__D__", str(digits))
    )


_PLANES = f"""
        SELECT t, h, d,
               CAST((({hash64_duck(
                   "CAST(t AS VARCHAR) || ',' || CAST(h AS VARCHAR) "
                   "|| ',' || CAST(d AS VARCHAR)")}) % 2) * 2 - 1 AS DOUBLE)
                   AS sign
        FROM range({LSH_TABLES}) r1(t), range({LSH_PLANES}) r2(h),
             range(64) r3(d)
"""

_BUCKETS = f"""
        WITH planes AS ({_PLANES}),
        unpacked AS (
            SELECT vec_id, u.i - 1 AS d, CAST(u.x AS DOUBLE) AS x
            FROM (
                SELECT vec_id,
                       unnest(list_transform(embedding,
                           (x, i) -> {{'x': x, 'i': i}})) AS u
                FROM embeddings
            )
        ),
        proj AS (
            SELECT vec_id, t, h, round(sum(x * sign), 9) AS dot
            FROM unpacked JOIN planes USING (d)
            GROUP BY vec_id, t, h
        )
        SELECT vec_id, t AS table_id,
               CAST(sum(CASE WHEN dot >= 0 THEN 1 << CAST(h AS INT)
                             ELSE 0 END) AS INT) AS bucket
        FROM proj
        GROUP BY vec_id, t
"""

ORACLES = {
    "sim_topk_bruteforce": f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qe
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   {_cos_sql("q.qe", "e.embedding")} AS cos
            FROM embeddings e JOIN q ON e.vec_id != q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cos, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """,
    "sim_lsh_buckets": f"""
        {_BUCKETS}
        ORDER BY vec_id, table_id
    """,
    "dedup_embed_cosine": f"""
        WITH buckets AS ({_BUCKETS}),
        cands AS (
            SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
            FROM buckets l JOIN buckets r
              ON l.table_id = r.table_id AND l.bucket = r.bucket
             AND l.vec_id < r.vec_id
        )
        SELECT * FROM (
            SELECT c.a, c.b,
                   {_cos_sql("ea.embedding", "eb.embedding")} AS cos
            FROM cands c
            JOIN embeddings ea ON ea.vec_id = c.a
            JOIN embeddings eb ON eb.vec_id = c.b
        )
        WHERE cos >= {NEAR_DUP_COS}
        ORDER BY cos DESC, a, b
    """,
    "sim_lsh_candidates": f"""
        WITH buckets AS ({_BUCKETS}),
        cands AS (
            SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
            FROM buckets l JOIN buckets r
              ON l.table_id = r.table_id AND l.bucket = r.bucket
             AND l.vec_id < r.vec_id
        )
        SELECT c.a, c.b,
               {_cos_sql("ea.embedding", "eb.embedding")} AS cos
        FROM cands c
        JOIN embeddings ea ON ea.vec_id = c.a
        JOIN embeddings eb ON eb.vec_id = c.b
        ORDER BY cos DESC, a, b
        LIMIT 50
    """,
    "sim_mutual_nn": f"""
        WITH buckets AS ({_BUCKETS}),
        cands AS (
            SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
            FROM buckets l JOIN buckets r
              ON l.table_id = r.table_id AND l.bucket = r.bucket
             AND l.vec_id < r.vec_id
        ),
        scored AS (
            SELECT c.a, c.b,
                   {_cos_sql("ea.embedding", "eb.embedding")} AS cos
            FROM cands c
            JOIN embeddings ea ON ea.vec_id = c.a
            JOIN embeddings eb ON eb.vec_id = c.b
        ),
        directed AS (
            SELECT a AS v, b AS n, cos FROM scored
            UNION ALL
            SELECT b AS v, a AS n, cos FROM scored
        ),
        nn AS (
            SELECT v, n, cos FROM (
                SELECT v, n, cos,
                       row_number() OVER (
                           PARTITION BY v ORDER BY cos DESC, n ASC
                       ) AS rk
                FROM directed WHERE cos IS NOT NULL
            ) WHERE rk = 1
        )
        SELECT x.v AS a, x.n AS b, x.cos AS cos
        FROM nn x JOIN nn y
          ON x.v = y.n AND x.n = y.v AND x.v < x.n
        ORDER BY a
    """,
}
