"""Naive-Bayes quality classifier over `documents` — the
fastText-style learned quality filter every production LLM data
pipeline runs (CCNet trains against Wikipedia, FineWeb-Edu and
DCLM against LLM-labeled seeds): train a cheap linear model on a
labeled subset, then score the WHOLE corpus with it.

Labels here are weak supervision: the Gopher/C4 rule gates from
`quality.rule_flags` (positive = passes all five gates). The
classifier distills those hard gates into a soft, generalizing
score — the standard pseudo-labeling bootstrap when no trusted seed
corpus is mounted. Pointing the label column at a real seed set
changes nothing structurally.

Model: multinomial Naive Bayes over hashed word unigrams (the same
`hash64` bucket space DSIR uses, different salt). Per-bucket
log-odds with add-one smoothing

    w(b)  = ln((c_pos(b)+1)/(n_pos+B)) - ln((c_neg(b)+1)/(n_neg+B))
    prior = ln((d_pos+1)/(d_neg+1))

and a doc's posterior log-odds is prior + sum_b c_doc(b)·w(b).

Operating point: the raw NB decision (log-odds > 0) is degenerate
here — on this corpus every document scores positive (the class-
conditional token distributions are close, the positive prior
dominates, and the margin grows with document length), which is the
usual fastText-filter experience: you never cut at raw zero, you
calibrate a threshold against the score distribution. The calibrated
cut used: midway between the two class score centroids (the LDA-
style equidistant point), computed with truncating integer division
so both engines agree to the micro-nat — mean_pos and mean_neg are
score-scale integers, so this stays overflow-safe at any corpus
size. Distinct from DSIR (`importance.py`):
DSIR ratios two corpus-level distributions (target vs raw,
unsupervised); this is a supervised two-class discriminative score
with a prior, trained on per-document labels.

Float discipline (the lm.py/dsir pattern): every w(b) and the prior
are quantized ONCE to integer micro-nats, so per-doc totals are
exact bigint sums — identical under any partitioning and between
engines; the one division back to nats happens on the final select
and displays at SIX decimals — the micro-nat grid itself — so the
rounding is a no-op and can never land on a .5 boundary (a 4-dp
display hit one at sf0.1: margin 4306950 µnats → 4.30695 rounds
HALF_UP in Spark, down in DuckDB's double rounding).

Scale shape: training is one corpus explode collapsed map-side into
per-(doc,bucket) counts, then a B-row model aggregate — the model is
corpus-size-independent and rides a broadcast back over the same
per-doc counts for scoring. Labeling is a shuffle-free projection
(`rule_flags`). No all-pairs, no windows, no driver-side state; the
corpus is never shuffled on anything wider than (doc_id, bucket).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.textfns import hash64, hash64_duck, tokens
from ..sources.catalog import PARTITIONED_CACHE_DIR, _fingerprint_ok, load
from .quality import GATE_METRICS_CTES, KEEP_EXPR, rule_flags

_TOKS = "string_split_regex(trim(text), '\\s+')"

#: hashed feature buckets (same scale story as importance.N_BUCKETS)
N_BUCKETS = 512
#: micro-nat quantization: integer per-token weights sum exactly
QUANT = 1_000_000
_SALT = "nbq"
#: bounded model inspection head
MODEL_HEAD = 10


def _labeled_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, bucket, c): per-document hashed-bucket counts
    with the weak label attached. One explode pass, partial-agged
    on (doc_id, bucket) before any exchange; the label is a narrow
    projection so it adds no shuffle."""
    docs = rule_flags(load(spark, sf_dir, "documents")).select(
        "doc_id", "text", F.col("keep").alias("pos")
    )
    return (
        docs.select(
            "doc_id", "pos", F.explode(tokens("text")).alias("w")
        )
        .withColumn("bucket", hash64(F.col("w"), _SALT) % N_BUCKETS)
        .groupBy("doc_id", "pos", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _model(pdb: DataFrame) -> DataFrame:
    """(bucket, c_pos, c_neg, w_unats): the B-row NB model."""
    counts = pdb.groupBy("bucket").agg(
        F.sum(F.when(F.col("pos"), F.col("c")).otherwise(0)).alias("c_pos"),
        F.sum(F.when(~F.col("pos"), F.col("c")).otherwise(0)).alias("c_neg"),
    )
    totals = counts.agg(
        F.sum("c_pos").alias("n_pos"), F.sum("c_neg").alias("n_neg")
    )
    w = F.log((F.col("c_pos") + 1) / (F.col("n_pos") + N_BUCKETS)) - F.log(
        (F.col("c_neg") + 1) / (F.col("n_neg") + N_BUCKETS)
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "c_pos",
        "c_neg",
        F.round(w * QUANT).cast("bigint").alias("w_unats"),
    )


def _prior(pdb: DataFrame) -> DataFrame:
    """1-row (d_pos, d_neg, prior_unats) from the labeled doc set."""
    docs = pdb.select("doc_id", "pos").distinct()
    return docs.agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("d_pos"),
        F.sum(F.when(~F.col("pos"), 1).otherwise(0)).alias("d_neg"),
    ).select(
        "d_pos",
        "d_neg",
        F.round(
            (F.log(F.col("d_pos") + 1) - F.log(F.col("d_neg") + 1)) * QUANT
        )
        .cast("bigint")
        .alias("prior_unats"),
    )


#: bump to invalidate persisted model caches when training changes
MODEL_VERSION = 1

_CACHE_DIR = PARTITIONED_CACHE_DIR.replace("events_by_date", "nbq_model")


def _model_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("bucket", T.LongType()),
            T.StructField("c_pos", T.LongType()),
            T.StructField("c_neg", T.LongType()),
            T.StructField("w_unats", T.LongType()),
        ]
    )


def _params_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("prior_unats", T.LongType()),
            T.StructField("bar_u", T.LongType()),
        ]
    )


def _margins(pdb: DataFrame, model: DataFrame, prior: DataFrame) -> DataFrame:
    """(doc_id, pos, margin_u): exact integer posterior log-odds per
    labeled document — the shared scoring join (B-row model and 1-row
    prior both broadcast)."""
    return (
        pdb.join(F.broadcast(model.select("bucket", "w_unats")), "bucket")
        .groupBy("doc_id", "pos")
        .agg(F.sum(F.col("c") * F.col("w_unats")).alias("tok_unats"))
        .crossJoin(F.broadcast(prior.select("prior_unats")))
        .select(
            "doc_id",
            "pos",
            (F.col("tok_unats") + F.col("prior_unats")).alias("margin_u"),
        )
    )


def _calibration_bar(scored: DataFrame) -> DataFrame:
    """1-row bar_u: midway between the class score centroids, all
    truncating integer division (exact + overflow-safe cross-engine);
    a one-class corpus falls back to the raw NB cut (0)."""
    return scored.groupBy().agg(
        F.expr(
            "sum(CASE WHEN pos THEN margin_u ELSE 0 END)"
            " div nullif(sum(CASE WHEN pos THEN 1 ELSE 0 END), 0)"
        ).alias("mean_pos_u"),
        F.expr(
            "sum(CASE WHEN NOT pos THEN margin_u ELSE 0 END)"
            " div nullif(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END), 0)"
        ).alias("mean_neg_u"),
    ).selectExpr("coalesce((mean_pos_u + mean_neg_u) div 2, 0) AS bar_u")


def _index_model(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The trained classifier, PERSISTED once per sf_dir (the ivf
    `_index_centroids` discipline: fingerprint of the source
    documents file + training params invalidates the cache). Returns
    (model, params): the B-row log-odds table and the 1-row
    (prior_unats, bar_u) operating point. Train once, serve many —
    the batch queries AND the streaming shard scorer
    (`streaming/qualityserve.py`) read this same frozen model, so
    they cannot drift."""
    src = os.path.join(sf_dir, "documents.parquet")
    path = os.path.join(
        _CACHE_DIR, os.path.basename(os.path.normpath(sf_dir))
    )
    marker = os.path.join(path, "_FINGERPRINT.json")
    st = os.stat(src)
    fp = {
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
        "model_version": MODEL_VERSION,
        "params": [N_BUCKETS, QUANT, _SALT],
    }
    if not _fingerprint_ok(marker, fp):
        pdb = _labeled_buckets(spark, sf_dir).localCheckpoint(eager=False)
        model = _model(pdb).localCheckpoint(eager=False)
        prior = _prior(pdb)
        bar = _calibration_bar(_margins(pdb, model, prior))
        model.write.mode("overwrite").parquet(os.path.join(path, "model"))
        (
            prior.select("prior_unats")
            .crossJoin(F.broadcast(bar))
            .write.mode("overwrite")
            .parquet(os.path.join(path, "params"))
        )
        with open(marker, "w") as f:
            json.dump(fp, f)
    return (
        spark.read.schema(_model_schema()).parquet(
            os.path.join(path, "model")
        ),
        spark.read.schema(_params_schema()).parquet(
            os.path.join(path, "params")
        ),
    )


def score_docs(docs: DataFrame, model: DataFrame, params: DataFrame) -> DataFrame:
    """Score an arbitrary documents frame under a FROZEN model: the
    serving path. Stateless narrow work + one (doc_id, bucket)
    partial agg; model and params ride broadcasts. Used by
    `nbq_select` on the corpus and by the streaming shard scorer on
    micro-batches — one code path, parity by construction."""
    labeled = rule_flags(docs).select(
        "doc_id", "text", F.col("keep").alias("pos")
    )
    pdb = (
        labeled.select(
            "doc_id", "pos", F.explode(tokens("text")).alias("w")
        )
        .withColumn("bucket", hash64(F.col("w"), _SALT) % N_BUCKETS)
        .groupBy("doc_id", "pos", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        pdb.join(F.broadcast(model.select("bucket", "w_unats")), "bucket")
        .groupBy("doc_id", "pos")
        .agg(F.sum(F.col("c") * F.col("w_unats")).alias("tok_unats"))
        .crossJoin(F.broadcast(params))
        .select(
            "doc_id",
            F.round(
                (F.col("tok_unats") + F.col("prior_unats")) / QUANT, 6
            ).alias("log_odds"),
            (
                F.col("tok_unats") + F.col("prior_unats") > F.col("bar_u")
            ).alias("keep_nb"),
            F.col("pos").alias("keep_rule"),
        )
    )


def nbq_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MODEL_HEAD most discriminative hash buckets (|log-odds|
    desc, bucket asc): the inspectable face of the trained model,
    bounded regardless of corpus size. Reads the persisted model."""
    model, _ = _index_model(spark, sf_dir)
    return (
        model
        .select(
            "bucket",
            "c_pos",
            "c_neg",
            F.round(F.col("w_unats") / QUANT, 6).alias("log_odds"),
        )
        .orderBy(
            F.abs(F.col("w_unats")).desc(), "bucket"
        )
        .limit(MODEL_HEAD)
    )


def nbq_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide scoring pass: per document the posterior log-odds
    (nats, rounded from the exact integer total), the calibrated NB
    verdict, and the weak rule label it was trained against — so
    rule/model agreement is directly visible. Reads the PERSISTED
    model and operating point (`_index_model` — train once, serve
    many), then runs the shared `score_docs` serving path over the
    corpus; model and params ride broadcasts, so per-query work is
    one labeled-explode scan + a (doc_id, bucket) partial agg."""
    model, params = _index_model(spark, sf_dir)
    return score_docs(
        load(spark, sf_dir, "documents"), model, params
    ).orderBy("doc_id")


QUERIES = {
    "nbq_model": nbq_model,
    "nbq_select": nbq_select,
}

# ---- DuckDB twins -------------------------------------------------

_PDB_CTES = f"""
    WITH {GATE_METRICS_CTES},
    labels AS (
        SELECT doc_id, {KEEP_EXPR} AS pos FROM m
    ),
    bt AS (
        SELECT t.doc_id, labels.pos,
               {hash64_duck("u.w", f"'{_SALT}'")} % {N_BUCKETS} AS bucket
        FROM (SELECT doc_id, unnest({_TOKS}) AS w FROM documents) u
        JOIN t ON u.doc_id = t.doc_id
        JOIN labels ON u.doc_id = labels.doc_id
    ),
    pdb AS (
        SELECT doc_id, pos, bucket, count(*) AS c
        FROM bt GROUP BY doc_id, pos, bucket
    ),
    counts AS (
        SELECT bucket,
               CAST(sum(CASE WHEN pos THEN c ELSE 0 END) AS BIGINT)
                   AS c_pos,
               CAST(sum(CASE WHEN NOT pos THEN c ELSE 0 END) AS BIGINT)
                   AS c_neg
        FROM pdb GROUP BY bucket
    ),
    totals AS (
        SELECT CAST(sum(c_pos) AS BIGINT) AS n_pos,
               CAST(sum(c_neg) AS BIGINT) AS n_neg
        FROM counts
    ),
    model AS (
        SELECT bucket, c_pos, c_neg,
               CAST(round((ln((c_pos + 1) / (n_pos + {N_BUCKETS}))
                           - ln((c_neg + 1) / (n_neg + {N_BUCKETS})))
                          * {QUANT}) AS BIGINT) AS w_unats
        FROM counts CROSS JOIN totals
    )
"""

ORACLES = {
    "nbq_model": f"""
        {_PDB_CTES}
        SELECT bucket, c_pos, c_neg,
               round(w_unats / {QUANT}, 6) AS log_odds
        FROM model
        ORDER BY abs(w_unats) DESC, bucket
        LIMIT {MODEL_HEAD}
    """,
    "nbq_select": f"""
        {_PDB_CTES},
        prior AS (
            SELECT CAST(round((ln(sum(CASE WHEN pos THEN 1 ELSE 0 END)
                                  + 1)
                               - ln(sum(CASE WHEN NOT pos THEN 1
                                        ELSE 0 END) + 1))
                              * {QUANT}) AS BIGINT) AS prior_unats
            FROM (SELECT DISTINCT doc_id, pos FROM pdb)
        ),
        scored AS (
            SELECT doc_id, pos,
                   CAST(sum(c * w_unats) AS BIGINT) + prior_unats
                       AS margin_u
            FROM pdb JOIN model USING (bucket)
            CROSS JOIN prior
            GROUP BY doc_id, pos, prior_unats
        ),
        bar AS (
            SELECT (CAST(sum(CASE WHEN pos THEN margin_u ELSE 0 END)
                         AS BIGINT)
                        // NULLIF(sum(CASE WHEN pos THEN 1
                                     ELSE 0 END), 0)
                    + CAST(sum(CASE WHEN NOT pos THEN margin_u
                               ELSE 0 END) AS BIGINT)
                        // NULLIF(sum(CASE WHEN NOT pos THEN 1
                                     ELSE 0 END), 0))
                   // 2 AS bar_u_raw
            FROM scored
        )
        SELECT doc_id,
               round(margin_u / {QUANT}, 6) AS log_odds,
               margin_u > COALESCE(bar_u_raw, 0) AS keep_nb,
               pos AS keep_rule
        FROM scored CROSS JOIN bar
        ORDER BY doc_id
    """,
}
