"""Product-quantization (PQ) ANN over the `embeddings` table — the
third ANN path next to sign-projection LSH (`similarity.py`) and
IVF-flat (`ivf.py`), and the one that changes the STORAGE story: each
64-d float32 vector (256 bytes) compresses to an M=8-subspace code of
4 bits each — one bigint, 8 bytes, 32x smaller — plus its true norm.
At 100 TB of embeddings that is the difference between "the index fits
in cluster RAM" and "it doesn't" (Jegou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

Pipeline:

1. **Codebooks** — subspace m (dims 8m..8m+7) gets K_SUB=16 codewords
   seeded from the smallest-hash training sample (`ivf.py`'s
   deterministic-sample convention, salt 'pq') and Lloyd-refined for
   LLOYD_ITERS rounds in LONG FORM: one (vec_id, m, subvec) frame
   handles all 8 subspaces in a single assignment join + one
   quantized-integer mean aggregate per round — no per-subspace
   loops, and the integer sums make the means bit-identical across
   engines regardless of summation order (`ivf._lloyd`'s trick).
   Training is a bounded TRAIN_N-row sample: codebook cost is
   corpus-size-independent.
2. **Encode** (`sim_pq_encode`) — each corpus vector folds against
   the broadcast codebook row: per subspace, argmin-L2 codeword
   (round-9 scores, ties to the smaller code — the repo's
   round-before-compare convention), packed little-endian 4 bits per
   subspace into ONE bigint. A narrow projection over one corpus
   scan: no explode, no shuffle (plan-asserted). The per-vector
   reconstruction error comes free from the same fold.
3. **Search** (`sim_pq_topk`) — asymmetric distance computation
   (ADC): each query precomputes a 128-entry table of subspace dot
   products against every codeword (query-side, tiny), then every
   corpus code row is scored with 8 table lookups + 8 adds — no
   decompression, no 64-d arithmetic on the corpus side. The ADC
   top-RERANK candidates per query are exact-cosine re-ranked to
   TOP_K (the standard two-stage PQ serving shape). The corpus scan
   joins only against the BROADCAST bounded query set; candidates
   (RERANK per query) are the only rows that ever touch full vectors
   again.

100-TB shape: codebook construction touches TRAIN_N rows; encode is
one corpus scan producing 8-byte codes; search streams codes against
broadcast query tables and re-ranks RERANK*|queries| full vectors.
The corpus is never shuffled, never exploded. For query batches too
large to broadcast, the same plan shards the query set — the corpus
side is embarrassingly parallel either way.

Cross-engine determinism: codeword assignment and ADC ranking both
round scores (9 and 4 digits respectively) before any comparison;
ties break toward the smaller code / neighbor id on both engines.
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
    _dot,
    _with_norm,
)

DIMS = 64
M_SUB = 8  # subspaces
SUB = DIMS // M_SUB  # dims per subspace
K_SUB = 16  # codewords per subspace -> 4 bits per code
LLOYD_ITERS = 2
TRAIN_N = 256
# ADC candidates exact-re-ranked per query. 4-bit codes are a coarse
# ranking signal on near-orthogonal synthetic vectors, so the ADC
# stage is a RECALL filter, not a ranker: 100 candidates -> 0.83
# recall@3 vs exact at sf0.01 (10 -> 0.33). Constant per query — the
# re-rank join touches RERANK*|queries| full vectors at any corpus
# size, so raising it does not change the 100 TB shape.
RERANK = 100
_SALT = "pq"
_QUANT = 1_000_000.0  # integer-quantization grid for exact means

# little-endian positional multipliers: code = sum_m j_m * 16^m
_POWERS = [K_SUB**m for m in range(M_SUB)]


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as an ordered fold (both engines sum the
    dimension terms in array order — bit-identical)."""
    diff2 = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)


def _sub(vec: Column, m) -> Column:
    """Subvector of subspace m (0-based), as float-preserving slice —
    casts happen inside the distance folds."""
    mm = F.lit(m) if isinstance(m, int) else m
    return F.slice(vec, mm * SUB + 1, SUB)


def _hash_prefix(emb: DataFrame, n: int) -> DataFrame:
    """The n vectors with the smallest hash64('pq', vec_id) —
    deterministic sample via TakeOrderedAndProject."""
    return (
        emb.withColumn("hk", hash64(F.col("vec_id").cast("string"), _SALT))
        .orderBy("hk", "vec_id")
        .limit(n)
        .drop("hk")
    )


def _long_sub(df: DataFrame) -> DataFrame:
    """(vec_id, m, sv): every row exploded to its M_SUB subvectors
    (double arrays). Only ever applied to the bounded training sample."""
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(M_SUB - 1)),
        lambda m: F.struct(
            m.alias("m"),
            F.transform(_sub(F.col("embedding"), m), lambda x: x.cast("double")).alias(
                "sv"
            ),
        ),
    )
    return df.select("vec_id", F.explode(subs).alias("s")).select(
        "vec_id", "s.m", "s.sv"
    )


def _codebook(emb: DataFrame) -> DataFrame:
    """(m, j, cw): K_SUB Lloyd-refined codewords per subspace.
    Init: codeword j of every subspace = the j-th smallest-hash
    sample's subvector. Refinement in long form — one assignment join
    + one quantized-mean aggregate per round covers all subspaces."""
    sample = _hash_prefix(emb, TRAIN_N).localCheckpoint(eager=False)
    w = Window.orderBy(
        hash64(F.col("vec_id").cast("string"), _SALT), "vec_id"
    )
    seeds = (
        _hash_prefix(sample, K_SUB)
        .withColumn("j", F.row_number().over(w) - 1)
        .select("j", "embedding")
    )
    cb = _long_sub(seeds.withColumnRenamed("j", "vec_id")).select(
        F.col("vec_id").alias("j"), "m", F.col("sv").alias("cw")
    )
    train_sub = _long_sub(sample).localCheckpoint(eager=False)
    for _ in range(LLOYD_ITERS):
        scored = train_sub.join(F.broadcast(cb), "m").select(
            "vec_id",
            "m",
            F.struct(
                F.round(_l2sq(F.col("sv"), F.col("cw")), 9).alias("s"),
                F.col("j").alias("j"),
                F.col("sv").alias("sv"),
            ).alias("sjv"),
        )
        # min-struct argmin: (s, j) is unique per group, so the sv
        # payload rides along without influencing the ordering
        assigned = scored.groupBy("vec_id", "m").agg(F.min("sjv").alias("b"))
        sums = (
            assigned.select(
                "m",
                F.col("b.j").alias("j"),
                F.posexplode(
                    F.transform(
                        "b.sv",
                        lambda x: F.round(x * F.lit(_QUANT)).cast("long"),
                    )
                ).alias("dim", "q"),
            )
            .groupBy("m", "j", "dim")
            .agg(F.sum("q").alias("qs"), F.count(F.lit(1)).alias("c"))
        )
        means = (
            sums.select(
                "m",
                "j",
                F.struct(
                    "dim",
                    (F.col("qs").cast("double") / (F.lit(_QUANT) * F.col("c"))).alias(
                        "v"
                    ),
                ).alias("dv"),
            )
            .groupBy("m", "j")
            .agg(F.array_sort(F.collect_list("dv")).alias("dvs"))
            .select("m", "j", F.transform("dvs", lambda s: s["v"]).alias("mcw"))
        )
        cb = (
            cb.join(means, ["m", "j"], "left")
            .select("m", "j", F.coalesce("mcw", "cw").alias("cw"))
        )
    return cb


#: bump to invalidate persisted codebook caches when training changes
INDEX_VERSION = 1

_CACHE_DIR = PARTITIONED_CACHE_DIR.replace("events_by_date", "pq_codebooks")


def _cb_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("m", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("cw", T.ArrayType(T.DoubleType())),
        ]
    )


def _index_codebook(
    spark: SparkSession, sf_dir: str, emb: DataFrame
) -> DataFrame:
    """The trained codebooks, PERSISTED once per sf_dir (fingerprint
    of the source embeddings file + training params invalidates) —
    the same one-time-ETL treatment as `ivf._index_centroids`: PQ
    training is index construction, and before this cache both pq
    queries re-ran the bounded-sample Lloyd per call, dominating
    their runtime."""
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
        "params": [M_SUB, K_SUB, LLOYD_ITERS, TRAIN_N],
    }
    if not _fingerprint_ok(marker, fp):
        (
            _codebook(emb)
            .select(
                F.col("m").cast("int").alias("m"),
                F.col("j").cast("int").alias("j"),
                "cw",
            )
            .write.mode("overwrite")
            .parquet(path)
        )
        with open(marker, "w") as f:
            json.dump(fp, f)
    return spark.read.schema(_cb_schema()).parquet(path)


def _codebook_row(cb: DataFrame) -> DataFrame:
    """All M_SUB*K_SUB codewords in ONE broadcastable row, sorted by
    (m, j) so entry (m, j) sits at index m*K_SUB + j + 1."""
    return cb.agg(
        F.sort_array(F.collect_list(F.struct("m", "j", "cw"))).alias("cbs")
    )


def _encoded(emb_n: DataFrame, cb_row: DataFrame) -> DataFrame:
    """(vec_id, best, code, norm): per-row fold encode — for each
    subspace the argmin-L2 codeword over the broadcast codebook slice,
    packed 4 bits per subspace into one bigint."""
    best_arr = F.transform(
        F.sequence(F.lit(0), F.lit(M_SUB - 1)),
        lambda m: F.array_min(
            F.transform(
                F.slice(F.col("cbs"), m * K_SUB + 1, K_SUB),
                lambda c: F.struct(
                    F.round(
                        _l2sq(
                            F.transform(
                                _sub(F.col("embedding"), m),
                                lambda x: x.cast("double"),
                            ),
                            c["cw"],
                        ),
                        9,
                    ).alias("s"),
                    c["j"].alias("j"),
                ),
            )
        ),
    )
    powers = F.array(*[F.lit(p).cast("bigint") for p in _POWERS])
    return (
        emb_n.crossJoin(F.broadcast(cb_row))
        .withColumn("best", best_arr)
        .select(
            "vec_id",
            "embedding",
            "norm",
            "best",
            F.aggregate(
                F.zip_with(
                    F.transform("best", lambda b: b["j"].cast("bigint")),
                    powers,
                    lambda j, p: j * p,
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("code"),
        )
    )


def sim_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ-compressed index: every vector's packed code (one bigint
    = 8 x 4-bit codewords) and its reconstruction error — the
    compression-quality signal."""
    emb_n = _with_norm(load(spark, sf_dir, "embeddings"))
    enc = _encoded(
        emb_n, _codebook_row(_index_codebook(spark, sf_dir, emb_n))
    )
    recon = F.sqrt(
        F.aggregate(
            F.transform("best", lambda b: b["s"]),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return enc.select(
        "vec_id", "code", F.round(recon, 4).alias("recon_err")
    ).orderBy("vec_id")


_CODES_DIR = PARTITIONED_CACHE_DIR.replace("events_by_date", "pq_codes")


def _codes_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("code", T.LongType()),
            T.StructField("norm", T.DoubleType()),
        ]
    )


def encoded_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ index payload — every vector's packed code + norm —
    PERSISTED per sf_dir like the codebooks: the codes ARE the index
    (8 bytes/vector), and search should scan the stored 32x-compressed
    table, not re-encode the full-width corpus per query."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    path = os.path.join(
        _CODES_DIR, os.path.basename(os.path.normpath(sf_dir))
    )
    marker = os.path.join(path, "_FINGERPRINT.json")
    st = os.stat(src)
    fp = {
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
        "index_version": INDEX_VERSION,
        "params": [M_SUB, K_SUB, LLOYD_ITERS, TRAIN_N],
    }
    if not _fingerprint_ok(marker, fp):
        emb_n = _with_norm(load(spark, sf_dir, "embeddings"))
        cb_row = _codebook_row(_index_codebook(spark, sf_dir, emb_n))
        (
            _encoded(emb_n, cb_row)
            .select("vec_id", "code", "norm")
            .write.mode("overwrite")
            .parquet(path)
        )
        with open(marker, "w") as f:
            json.dump(fp, f)
    return spark.read.schema(_codes_schema()).parquet(path)


def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage PQ ANN: ADC scoring of every corpus code against the
    broadcast per-query distance tables, then exact-cosine re-rank of
    the top-RERANK candidates. The corpus side reads the PERSISTED
    code table (8 bytes/vector); full vectors are touched only by the
    RERANK-candidate re-join."""
    emb_n = _with_norm(load(spark, sf_dir, "embeddings"))
    cb_row = _codebook_row(_index_codebook(spark, sf_dir, emb_n))
    codes = encoded_codes(spark, sf_dir).select(
        F.col("vec_id").alias("neighbor_id"), "code", F.col("norm").alias("nn")
    )
    # query-side ADC tables: dot(q_sub_m, cw(m, j)) for all 128
    # codewords — tiny, computed once per query, broadcast with it
    dtable = F.transform(
        F.col("cbs"),
        lambda c: _dot(_sub(F.col("embedding"), c["m"]), c["cw"]),
    )
    queries = (
        emb_n.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cb_row))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("norm").alias("qn"),
            dtable.alias("dt"),
        )
    )
    # ADC: decode 4-bit codes positionally, 8 lookups + 8 adds per
    # (corpus row, query) — the corpus side never touches full vectors
    powers = F.array(*[F.lit(p).cast("bigint") for p in _POWERS])
    jm = F.transform(powers, lambda p: (F.col("code") / p).cast("bigint") % K_SUB)
    adc_dot = F.aggregate(
        F.transform(
            jm,
            lambda j, m: F.element_at(
                F.col("dt"), (m * K_SUB + j + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    approx = F.round(adc_dot / F.nullif(F.col("qn") * F.col("nn"), F.lit(0.0)), 4)
    scored = (
        codes.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qe", "qn", "neighbor_id", approx.alias("approx_cos"))
        .filter(F.col("approx_cos").isNotNull())
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), F.asc("neighbor_id")
    )
    cands = scored.withColumn("r_adc", F.row_number().over(w_adc)).filter(
        F.col("r_adc") <= RERANK
    )
    # exact re-rank: only RERANK*|queries| rows ever rejoin full vectors
    exact = cands.join(
        emb_n.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("ne"),
            F.col("norm").alias("nn2"),
        ),
        "neighbor_id",
    ).select(
        "query_id",
        "neighbor_id",
        "approx_cos",
        F.round(
            _dot(F.col("qe"), F.col("ne"))
            / F.nullif(F.col("qn") * F.col("nn2"), F.lit(0.0)),
            4,
        ).alias("cos"),
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w_final).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "approx_cos", "rank")
        .orderBy("query_id", "rank")
    )


QUERIES = {
    "sim_pq_encode": sim_pq_encode,
    "sim_pq_topk": sim_pq_topk,
}

# ---- DuckDB twins -------------------------------------------------

_L2SQ = """
        list_sum(list_transform(list_zip(__A__, __B__),
            p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                 * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))
"""


def _l2sq_sql(a: str, b: str) -> str:
    return _L2SQ.replace("__A__", a).replace("__B__", b)


def _codebook_ctes() -> str:
    """CTE chain ending in `cb(m, j, cw)` — mirrors _codebook()
    decision-for-decision (hash-ordered sample, long-form argmin
    assignment on round-9 L2, integer-quantized exact means, empty
    cells coalesce to the previous codeword)."""
    parts = [
        f"""
        ordv AS (
            SELECT vec_id, embedding,
                   row_number() OVER (ORDER BY
                       {hash64_duck("CAST(vec_id AS VARCHAR)", f"'{_SALT}'")},
                       vec_id) AS hrn
            FROM embeddings
        ),
        tsub AS (
            SELECT vec_id, m.m AS m,
                   list_transform(
                       embedding[(m.m * {SUB} + 1):(m.m * {SUB} + {SUB})],
                       x -> CAST(x AS DOUBLE)) AS sv
            FROM ordv, (SELECT unnest(range({M_SUB})) AS m) m
            WHERE hrn <= {TRAIN_N}
        ),
        cb_0 AS (
            SELECT m.m AS m, hrn - 1 AS j,
                   list_transform(
                       embedding[(m.m * {SUB} + 1):(m.m * {SUB} + {SUB})],
                       x -> CAST(x AS DOUBLE)) AS cw
            FROM ordv, (SELECT unnest(range({M_SUB})) AS m) m
            WHERE hrn <= {K_SUB}
        )"""
    ]
    for i in range(LLOYD_ITERS):
        parts.append(
            f"""
        asg_{i} AS (
            SELECT vec_id, m, j, sv FROM (
                SELECT t.vec_id, t.m, c.j, t.sv,
                       row_number() OVER (
                           PARTITION BY t.vec_id, t.m
                           ORDER BY round({_l2sq_sql("t.sv", "c.cw")}, 9) ASC,
                                    c.j ASC) AS rn
                FROM tsub t JOIN cb_{i} c USING (m)
            ) WHERE rn = 1
        ),
        sums_{i} AS (
            SELECT a.m, a.j, d.dim,
                   CAST(sum(CAST(round(a.sv[d.dim + 1] * {_QUANT})
                                 AS BIGINT)) AS BIGINT) AS qs,
                   count(*) AS c
            FROM asg_{i} a, (SELECT unnest(range({SUB})) AS dim) d
            GROUP BY a.m, a.j, d.dim
        ),
        means_{i} AS (
            SELECT m, j,
                   list(CAST(qs AS DOUBLE) / ({_QUANT} * c) ORDER BY dim)
                       AS mcw
            FROM sums_{i} GROUP BY m, j
        ),
        cb_{i + 1} AS (
            SELECT c0.m, c0.j, coalesce(mn.mcw, c0.cw) AS cw
            FROM cb_{i} c0 LEFT JOIN means_{i} mn USING (m, j)
        )"""
        )
    parts.append(f"cb AS (SELECT m, j, cw FROM cb_{LLOYD_ITERS})")
    return ",".join(parts)


_CB_CTES = _codebook_ctes()

# per-(vector, subspace) best codeword on the round-9 L2 grid
_BEST = f"""
        SELECT vec_id, m, j, s FROM (
            SELECT e.vec_id, c.m, c.j,
                   round({_l2sq_sql(
                       "list_transform(e.embedding[(c.m * " + str(SUB)
                       + " + 1):(c.m * " + str(SUB) + " + " + str(SUB)
                       + ")], x -> CAST(x AS DOUBLE))", "c.cw")}, 9) AS s,
                   row_number() OVER (
                       PARTITION BY e.vec_id, c.m
                       ORDER BY round({_l2sq_sql(
                           "list_transform(e.embedding[(c.m * " + str(SUB)
                           + " + 1):(c.m * " + str(SUB) + " + " + str(SUB)
                           + ")], x -> CAST(x AS DOUBLE))", "c.cw")}, 9) ASC,
                                c.j ASC) AS rn
            FROM embeddings e, cb c
        ) WHERE rn = 1
"""

# ordered fold over subspaces: reconstruction error and packed code
_ENC = f"""
        SELECT vec_id,
               CAST(sum(j * CAST(power({K_SUB}, m) AS BIGINT)) AS BIGINT)
                   AS code,
               round(sqrt(sum(s)), 4) AS recon_err
        FROM best GROUP BY vec_id
"""

ORACLES = {
    "sim_pq_encode": f"""
        WITH {_CB_CTES},
        best AS ({_BEST}),
        enc AS ({_ENC})
        SELECT vec_id, code, recon_err
        FROM enc ORDER BY vec_id
    """,
    "sim_pq_topk": f"""
        WITH {_CB_CTES},
        best AS ({_BEST}),
        cblist AS (SELECT list(cw ORDER BY m, j) AS cbl FROM cb),
        nrm AS (
            SELECT vec_id,
                   sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
            FROM embeddings
        ),
        q AS (
            SELECT e.vec_id AS query_id, e.embedding AS qe, n.norm AS qn
            FROM embeddings e JOIN nrm n USING (vec_id)
            WHERE e.vec_id < {N_QUERIES}
        ),
        adc AS (
            SELECT q.query_id, q.qe, q.qn, b.vec_id AS neighbor_id,
                   round(
                       sum(list_sum(list_transform(
                           list_zip(
                               q.qe[(b.m * {SUB} + 1):(b.m * {SUB} + {SUB})],
                               (SELECT cbl FROM cblist)[b.m * {K_SUB} + b.j + 1]
                           ),
                           p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))
                       / nullif(q.qn * min(n.norm), 0.0), 4) AS approx_cos
            FROM best b
            JOIN nrm n ON n.vec_id = b.vec_id
            CROSS JOIN q
            WHERE b.vec_id != q.query_id
            GROUP BY q.query_id, q.qe, q.qn, b.vec_id
        ),
        cand AS (
            SELECT query_id, qe, qn, neighbor_id, approx_cos FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY approx_cos DESC, neighbor_id ASC) AS r_adc
                FROM adc WHERE approx_cos IS NOT NULL
            ) WHERE r_adc <= {RERANK}
        ),
        exact AS (
            SELECT c.query_id, c.neighbor_id, c.approx_cos,
                   {_cos_sql("c.qe", "ne.embedding")} AS cos
            FROM cand c JOIN embeddings ne ON ne.vec_id = c.neighbor_id
        )
        SELECT query_id, neighbor_id, cos, approx_cos,
               CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM exact
        )
        WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """,
}
