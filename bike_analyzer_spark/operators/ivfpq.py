"""IVF-PQ ANN — the composed index that carries real 100-TB vector
search (Jegou et al., TPAMI 2011; the FAISS `IVFxx,PQyy` default):
IVF routing prunes the corpus to N_PROBE inverted lists, PQ codes
make each list 32x smaller than raw float32, and only the final
RERANK candidates per query ever touch a full-width vector.

`ivf.py` proves the routing story (probe-pruned partitioned lists,
but each list stores raw vectors); `pq.py` proves the compression
story (8-byte codes, but every query scans ALL codes). This module
is their composition — the only shape where BOTH multiplicative
savings apply: a query reads N_PROBE/K of the corpus, at 8 bytes a
vector. At 10^11 vectors that is the difference between an index
that streams terabytes per query batch and one that reads a few
gigabytes of code partitions.

Index layout: one fingerprint-cached parquet table (vec_id, code,
norm) PARTITIONED BY centroid_id — the on-disk IVF-PQ index. A probe
reads N_PROBE partition directories of 8-byte codes and nothing else
(PartitionFilters prune, plan-asserted in tests). Centroids and PQ
codebooks reuse the persisted ivf/pq artifacts verbatim, so the
three indexes stay mutually consistent and train exactly once.

Search = the pq.py ADC kernel restricted to probed partitions: per
query a 128-entry subspace dot-product table (broadcast with the
probe set), 8 lookups + 8 adds per candidate code, ADC top-RERANK,
exact-cosine re-rank to TOP_K. Determinism: ADC and exact scores
round to 4 digits before any comparison, ties break toward the
smaller neighbor id — both engines agree (pq.py's contract).

Oracle: the full composition replayed in DuckDB — ivf's unrolled
Lloyd chain AND pq's codebook chain (CTE names prefixed to coexist),
probe selection from the query's own centroid ranking, ADC over the
per-(vector, subspace) best-codeword table, re-rank. The twins of
both parents are reused mechanically, so a mismatch isolates to the
composition, not the parts.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.catalog import PARTITIONED_CACHE_DIR, _fingerprint_ok, load
from .ivf import (
    INDEX_VERSION,
    K_MIN,
    LLOYD_ITERS,
    N_PROBE,
    TARGET_LIST_SIZE,
    TRAIN_MIN,
    TRAIN_PER_CLUSTER,
    _ASSIGN,
    _CENTS_CTES,
    _SCORED,
    _centroid_row,
    _index_centroids,
    _scored_cents,
    inverted_lists,
)
from .pq import (
    K_SUB,
    M_SUB,
    RERANK,
    SUB,
    _BEST,
    _CB_CTES,
    _POWERS,
    _codebook_row,
    _index_codebook,
    _sub,
    encoded_codes,
)
from .similarity import N_QUERIES, TOP_K, _cos_sql, _dot, _norm, _with_norm

_INDEX_DIR = PARTITIONED_CACHE_DIR.replace("events_by_date", "ivfpq_codes")


def _index_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("code", T.LongType()),
            T.StructField("norm", T.DoubleType()),
            T.StructField("centroid_id", T.LongType()),
        ]
    )


def ivfpq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-PQ index payload: every vector's 8-byte PQ code + true
    norm, persisted PARTITIONED BY its IVF list id. Composed from the
    two parent artifacts (`ivf.inverted_lists` routing,
    `pq.encoded_codes` payload) by one id-keyed join at BUILD time —
    search never pays it. Fingerprint-invalidated like both parents."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    path = os.path.join(
        _INDEX_DIR, os.path.basename(os.path.normpath(sf_dir))
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
            M_SUB,
            K_SUB,
            N_PROBE,
            RERANK,
        ],
    }
    if not _fingerprint_ok(marker, fp):
        routing = inverted_lists(spark, sf_dir).select(
            "vec_id", "centroid_id"
        )
        codes = encoded_codes(spark, sf_dir).select(
            "vec_id", "code", "norm"
        )
        (
            codes.join(routing, "vec_id")
            .repartition("centroid_id")
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(path)
        )
        with open(marker, "w") as f:
            json.dump(fp, f)
    return spark.read.schema(_index_schema()).parquet(path)


def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVF-PQ ANN: each query probes its N_PROBE nearest
    centroid partitions of the 8-byte code index, ADC-scores only
    those candidates, and exact-cosine re-ranks the ADC top-RERANK to
    TOP_K. The only rows that ever touch full-width vectors are the
    RERANK candidates per query."""
    emb_n = _with_norm(load(spark, sf_dir, "embeddings"))
    cents_row = _centroid_row(_index_centroids(spark, sf_dir, emb_n))
    cb_row = _codebook_row(_index_codebook(spark, sf_dir, emb_n))
    index = ivfpq_index(spark, sf_dir).select(
        F.col("vec_id").alias("neighbor_id"),
        "code",
        F.col("norm").alias("nn"),
        "centroid_id",
    )
    # query side: probe ids from the centroid ranking (ivf.topk_for's
    # expression) + the 128-entry ADC table (pq.sim_pq_topk's)
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
    dtable = F.transform(
        F.col("cbs"),
        lambda c: _dot(_sub(F.col("qe"), c["m"]), c["cw"]),
    )
    probes = (
        emb_n.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("norm").alias("qn"),
        )
        .crossJoin(F.broadcast(cents_row))
        .crossJoin(F.broadcast(cb_row))
        .select(
            "query_id",
            "qe",
            "qn",
            dtable.alias("dt"),
            F.explode(probe_cids).alias("centroid_id"),
        )
    )
    powers = F.array(*[F.lit(p).cast("bigint") for p in _POWERS])
    jm = F.transform(
        powers, lambda p: (F.col("code") / p).cast("bigint") % K_SUB
    )
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
    approx = F.round(
        adc_dot / F.nullif(F.col("qn") * F.col("nn"), F.lit(0.0)), 4
    )
    scored = (
        index.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "qe",
            "qn",
            "neighbor_id",
            approx.alias("approx_cos"),
        )
        .filter(F.col("approx_cos").isNotNull())
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), F.asc("neighbor_id")
    )
    cands = scored.withColumn(
        "r_adc", F.row_number().over(w_adc)
    ).filter(F.col("r_adc") <= RERANK)
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
        exact.withColumn(
            "rank", F.row_number().over(w_final).cast("bigint")
        )
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos", "approx_cos", "rank")
        .orderBy("query_id", "rank")
    )


QUERIES = {"sim_ivfpq_topk": sim_ivfpq_topk}

# ---- DuckDB twin ---------------------------------------------------

#: CTE names of the pq codebook chain, prefixed so it can coexist
#: with ivf's Lloyd chain (both define ordv/asg_i/sums_i/means_i)
_PQ_NAMES = (
    ["ordv", "tsub", "cb"]
    + [f"cb_{i}" for i in range(LLOYD_ITERS + 1)]
    + [f"asg_{i}" for i in range(LLOYD_ITERS)]
    + [f"sums_{i}" for i in range(LLOYD_ITERS)]
    + [f"means_{i}" for i in range(LLOYD_ITERS)]
)


def _prefix_pq(sql: str) -> str:
    for n in sorted(_PQ_NAMES, key=len, reverse=True):
        sql = re.sub(rf"\b{n}\b", f"pq_{n}", sql)
    return sql


def _ivfpq_oracle() -> str:
    best = _prefix_pq(_BEST)
    return f"""
        WITH {_CENTS_CTES},
        {_prefix_pq(_CB_CTES)},
        scored AS ({_SCORED}),
        assign AS ({_ASSIGN}),
        best AS ({best}),
        cblist AS (
            SELECT list(cw ORDER BY m, j) AS cbl FROM pq_cb
        ),
        nrm AS (
            SELECT vec_id,
                   sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                       AS norm
            FROM embeddings
        ),
        probes AS (
            SELECT a.vec_id AS query_id, a.cid,
                   qe.embedding AS qe, qn.norm AS qn
            FROM assign a
            JOIN embeddings qe ON qe.vec_id = a.vec_id
            JOIN nrm qn ON qn.vec_id = a.vec_id
            WHERE a.vec_id < {N_QUERIES} AND a.rn <= {N_PROBE}
        ),
        member AS (
            SELECT vec_id, cid FROM assign WHERE rn = 1
        ),
        adc AS (
            SELECT p.query_id, p.qe, p.qn, b.vec_id AS neighbor_id,
                   round(
                       sum(list_sum(list_transform(
                           list_zip(
                               p.qe[(b.m * {SUB} + 1):(b.m * {SUB} + {SUB})],
                               (SELECT cbl FROM cblist)
                                   [b.m * {K_SUB} + b.j + 1]
                           ),
                           z -> CAST(z[1] AS DOUBLE)
                                * CAST(z[2] AS DOUBLE))))
                       / nullif(p.qn * min(n.norm), 0.0), 4)
                       AS approx_cos
            FROM best b
            JOIN member mb ON mb.vec_id = b.vec_id
            JOIN probes p ON p.cid = mb.cid
            JOIN nrm n ON n.vec_id = b.vec_id
            WHERE b.vec_id != p.query_id
            GROUP BY p.query_id, p.qe, p.qn, b.vec_id
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
            FROM cand c
            JOIN embeddings ne ON ne.vec_id = c.neighbor_id
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
    """


ORACLES = {"sim_ivfpq_topk": _ivfpq_oracle()}
