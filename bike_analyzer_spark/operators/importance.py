"""DSIR-style importance weighting for data selection — score every
raw document by how target-like its hashed n-gram distribution is
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling": estimate bag-of-hashed-ngram unigram models for a target
corpus and the raw corpus, weight each raw doc by its likelihood
ratio, then keep the highest-weight docs).

Feature space: word unigrams hashed into N_BUCKETS via the repo's
portable md5 hash (`hash64` — bit-identical in Spark and DuckDB), so
both engines agree on every bucket assignment. The demo target is
the lang='en' slice of `documents`; a production run points it at a
trusted corpus (Wikipedia, books) instead.

Per-bucket log-likelihood ratio with add-one smoothing:

    lr(b) = ln((c_tgt(b)+1)/(n_tgt+B)) - ln((c_raw(b)+1)/(n_raw+B))

Float discipline (the lm.py pattern): each bucket's lr is quantized
ONCE to integer micro-nats (round(lr*1e6) as bigint), so per-doc
totals are exact integer sums — identical under ANY partitioning and
between engines; one IEEE division at the end is deterministic. The
residual cross-engine risk is a transcendental ulp landing within
~1e-9 of a .5 micro-nat boundary — the same accepted class as lm.py.

Scale shape: the bucket model is B rows (corpus-size-independent) and
rides a broadcast; the corpus pass is explode → per-doc bucket counts
(map-side partial agg on (doc_id, bucket)) → broadcast join → per-doc
sum. No all-pairs, no driver-side state, no ranking window: selection
compares each doc against a 1-row corpus-mean aggregate broadcast
back over the weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import hash64, hash64_duck, tokens
from ..sources.catalog import load

_TOKS = "string_split_regex(trim(text), '\\s+')"

#: hashed feature buckets; DSIR uses 10k for real corpora — 512 keeps
#: every bucket populated on the synthetic fixtures so smoothing
#: stays exercised rather than dominant
N_BUCKETS = 512
#: micro-nat quantization: integer per-token costs sum exactly
QUANT = 1_000_000
_SALT = "dsir"


def _per_doc_bucket(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket, c): per-document hashed-bucket counts —
    the ONE corpus explode pass. Both the bucket model (aggregate c
    over docs) and the per-doc weights (aggregate c over buckets)
    derive from this, so the raw token explosion runs once, not once
    per consumer; the explode's partial agg on (doc_id, bucket)
    collapses it back to ~B rows per doc before any exchange."""
    return (
        docs.select("doc_id", "lang", F.explode(tokens("text")).alias("w"))
        .withColumn("bucket", hash64(F.col("w"), _SALT) % N_BUCKETS)
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _bucket_lr(pdb: DataFrame) -> DataFrame:
    """(bucket, lr_unats): integer micro-nat log-likelihood ratio of
    target (lang='en') vs raw for every hash bucket. B rows, derived
    from the shared per-doc-bucket counts."""
    counts = pdb.groupBy("bucket").agg(
        F.sum("c").alias("c_raw"),
        F.sum(F.when(F.col("lang") == "en", F.col("c")).otherwise(0)).alias(
            "c_tgt"
        ),
    )
    totals = counts.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    lr = F.log(
        (F.col("c_tgt") + 1) / (F.col("n_tgt") + N_BUCKETS)
    ) - F.log((F.col("c_raw") + 1) / (F.col("n_raw") + N_BUCKETS))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(lr * QUANT).cast("bigint").alias("lr_unats"),
        )
    )


def _doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, unats): exact integer per-doc totals.

    Both pdb and the result are lazily checkpointed: pdb feeds two
    consumers (the model aggregate and the per-doc join) and the
    weights feed two more in dsir_select (the verdict and the
    corpus-mean bar) — without materialization Spark reruns the
    corpus explode once per consumer (plan-audited: five Generate
    nodes in the un-checkpointed dsir_select plan)."""
    pdb = _per_doc_bucket(
        load(spark, sf_dir, "documents")
    ).localCheckpoint(eager=False)
    return (
        pdb.join(F.broadcast(_bucket_lr(pdb)), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lr_unats")).alias("unats"),
        )
        .localCheckpoint(eager=False)
    )


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance: total and per-token
    log-likelihood ratio (nats) of target vs raw."""
    return (
        _doc_weights(spark, sf_dir)
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("unats") / QUANT, 6).alias("logratio"),
            F.round(F.col("unats") / F.col("n_tokens") / QUANT, 6).alias(
                "per_token"
            ),
        )
        .orderBy("doc_id")
    )


def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document selection verdict: keep docs whose per-token
    log-likelihood ratio clears the CORPUS token-weighted mean
    (= -KL(raw||tgt), exact from the integer totals) — "more
    target-like than the average token". Parameter-free and
    self-calibrating, so it stays non-degenerate at every scale
    factor, unlike a fixed cut (the weight distribution shifts with
    corpus size as the hashed-ngram models sharpen).

    Scale shape: the bar is a 1-row aggregate broadcast back over the
    weights — no ranking window, no driver-side take (a "top 25%"
    selection would need one or the other; DSIR's actual resampling
    needs an RNG both engines would have to share). Both engines
    compare on the same rounded grid derived from exact integer sums,
    so the verdict is bit-stable cross-engine."""
    w = _doc_weights(spark, sf_dir)
    bar = w.agg(
        F.sum("unats").alias("tot_unats"),
        F.sum("n_tokens").alias("tot_tokens"),
    )
    per_token = F.round(F.col("unats") / F.col("n_tokens") / QUANT, 6)
    mean_pt = F.round(
        F.col("tot_unats") / F.col("tot_tokens") / QUANT, 6
    )
    return (
        w.crossJoin(F.broadcast(bar))
        .select(
            "doc_id",
            per_token.alias("per_token"),
            (per_token >= mean_pt).alias("keep"),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "dsir_weights": dsir_weights,
    "dsir_select": dsir_select,
}

# ---- DuckDB twins -------------------------------------------------

_WEIGHTS_CTES = f"""
    WITH bt AS (
        SELECT doc_id, lang,
               {hash64_duck("u.w", f"'{_SALT}'")} % {N_BUCKETS} AS bucket
        FROM (SELECT doc_id, lang, unnest({_TOKS}) AS w
              FROM documents) u
    ),
    pdb AS (
        SELECT doc_id, lang, bucket, count(*) AS c
        FROM bt GROUP BY doc_id, lang, bucket
    ),
    counts AS (
        SELECT bucket, CAST(sum(c) AS BIGINT) AS c_raw,
               CAST(sum(CASE WHEN lang = 'en' THEN c ELSE 0 END)
                    AS BIGINT) AS c_tgt
        FROM pdb GROUP BY bucket
    ),
    totals AS (
        SELECT CAST(sum(c_raw) AS BIGINT) AS n_raw,
               CAST(sum(c_tgt) AS BIGINT) AS n_tgt
        FROM counts
    ),
    lr AS (
        SELECT bucket,
               CAST(round((ln((c_tgt + 1) / (n_tgt + {N_BUCKETS}))
                           - ln((c_raw + 1) / (n_raw + {N_BUCKETS})))
                          * {QUANT}) AS BIGINT) AS lr_unats
        FROM counts CROSS JOIN totals
    ),
    w AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(c * lr_unats) AS BIGINT) AS unats
        FROM pdb JOIN lr USING (bucket)
        GROUP BY doc_id
    )
"""

ORACLES = {
    "dsir_weights": f"""
        {_WEIGHTS_CTES}
        SELECT doc_id, n_tokens,
               round(unats / {QUANT}, 6) AS logratio,
               round(unats / n_tokens / {QUANT}, 6) AS per_token
        FROM w ORDER BY doc_id
    """,
    "dsir_select": f"""
        {_WEIGHTS_CTES},
        bar AS (
            SELECT CAST(sum(unats) AS BIGINT) AS tot_unats,
                   CAST(sum(n_tokens) AS BIGINT) AS tot_tokens
            FROM w
        )
        SELECT doc_id,
               round(unats / n_tokens / {QUANT}, 6) AS per_token,
               round(unats / n_tokens / {QUANT}, 6)
                   >= round(tot_unats / tot_tokens / {QUANT}, 6) AS keep
        FROM w CROSS JOIN bar ORDER BY doc_id
    """,
}
