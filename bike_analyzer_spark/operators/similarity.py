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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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


def _cosine(a, b):
    """cos(a, b) as a native fold: dot / (||a|| * ||b||), float64."""
    return _dot(a, b) / (_norm(a) * _norm(b))


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
    cos = _dot(F.col("qe"), F.col("embedding")) / (F.col("qn") * F.col("norm"))
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


def lsh_plane_signs(spark: SparkSession) -> DataFrame:
    """The (table, plane, dim) -> +/-1 weight lattice, derived from the
    portable hash — a tiny static dimension (T*H*64 rows), broadcast."""
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


def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection bucket per (vector, table): bit h of the
    bucket is [dot(v, plane_th) >= 0]."""
    emb = load(spark, sf_dir, "embeddings")
    unpacked = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "x")
    ).withColumn("x", F.col("x").cast("double"))
    planes = lsh_plane_signs(spark)
    proj = (
        unpacked.join(F.broadcast(planes), "d")
        .groupBy("vec_id", "t", "h")
        .agg(F.sum(F.col("x") * F.col("sign")).alias("dot"))
    )
    bucket = F.sum(
        F.when(F.col("dot") >= 0, F.expr("shiftleft(1, CAST(h AS INT))"))
        .otherwise(F.lit(0))
    ).cast("int")
    return (
        proj.groupBy("vec_id", "t")
        .agg(bucket.alias("bucket"))
        .select("vec_id", F.col("t").alias("table_id"), "bucket")
        .orderBy("vec_id", "table_id")
    )


def _scored_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs sharing any (table, bucket), scored with exact
    cosine — the shared core of sim_lsh_candidates and
    dedup_embed_cosine."""
    buckets = sim_lsh_buckets(spark, sf_dir)
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
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
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
}

# DuckDB twins. Element access: list_transform((x,i) -> ...) gives a
# 1-based index i, matching Spark's posexplode d via i = d + 1.
_COS = """
        round(
            list_sum(list_transform(list_zip(__A__, __B__),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(__A__,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(__B__,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
"""


def _cos_sql(a: str, b: str) -> str:
    return _COS.replace("__A__", a).replace("__B__", b)


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
            SELECT vec_id, t, h, sum(x * sign) AS dot
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
}
