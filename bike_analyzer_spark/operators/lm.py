"""Corpus language-model scoring — the CCNet-style quality signal: a
bigram LM with add-one smoothing is estimated FROM the corpus itself,
every document is scored as bits-per-bigram under that model, and the
corpus is bucketed by score (CCNet buckets on LM perplexity into
head/middle/tail; documents far from the corpus distribution —
gibberish or boilerplate — land in the tail).

Float discipline: per-document cost is a SUM over bigram log-probs,
and the documents table is read through the many-file spread copy, so
a naive double sum would be accumulation-order nondeterministic
against the sequential oracle. Each bigram's cost is therefore
quantized to integer micro-bits (round(-log2(p) * 1e6) as BIGINT —
the same exact-integer-mean trick IVF's Lloyd uses) and the per-doc
sum is exact in any order; one IEEE division at the end is
deterministic. Residual cross-engine risk: the quantization rounds a
TRANSCENDENTAL (JVM log vs DuckDB libm can differ by ulps), so a
value within ~1e-9 of a .5 micro-bit boundary could quantize apart —
~1e-9 per distinct bigram, negligible at test scale and the same
accepted class as the round(.,9)-before-sign in the LSH kernels.

Scale shape: two vocabulary-sized aggregates (bigram + unigram
counts), one shuffle join of exploded doc bigrams against the bigram
table on a uniformly-distributed text key (Catalyst/AQE picks
broadcast while the vocab fits, shuffle-hash beyond), one per-doc
aggregate. No all-pairs anything; LM size grows with vocabulary, not
corpus row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import shingle_exprs, shingles_duck, tokens
from ..sources.catalog import load

_TOKS = "string_split_regex(trim(text), '\\s+')"

#: micro-bits quantization: integer per-bigram costs sum exactly
QUANT = 1_000_000

#: score buckets (bits-per-bigram thresholds, CCNet's head/middle/
#: tail). CCNet sets these at corpus perplexity terciles; the synthetic
#: corpus is narrow (p25≈4.88, p75≈4.94 bits at sf0.01), so the cuts
#: sit at those terciles to keep the demo distribution non-degenerate
#: — on real data they'd be recomputed the same way.
HEAD_MAX_BITS = 4.89
MIDDLE_MAX_BITS = 4.95


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, bg) with multiplicity; docs need >= 2 tokens."""
    return (
        docs.withColumn("toks", tokens("text"))
        .filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(shingle_exprs("toks", 2)).alias("bg"))
    )


def _per_doc_ubits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, ubits): exact integer micro-bit totals.

    The exploded bigram and unigram frames each feed two consumers
    (counts + the scoring join; counts + the vocab size), so both
    materialize lazily once instead of re-exploding the corpus per
    consumer (plan-audited: 4 scans + 4 Generates before)."""
    docs = load(spark, sf_dir, "documents")
    bg = _doc_bigrams(docs).localCheckpoint(eager=False)
    bigram_c = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    uni = (
        docs.withColumn("toks", tokens("text"))
        .select("doc_id", F.explode("toks").alias("w"))
        .localCheckpoint(eager=False)
    )
    unigram_c = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    v = uni.agg(F.countDistinct("w").alias("v"))
    # P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V); every doc bigram HAS a
    # bigram and unigram count (the LM is trained on the same corpus),
    # so the joins are inner and lossless
    w1 = F.split(F.col("bg"), " ")[0]
    scored = (
        bg.join(bigram_c, "bg")
        .withColumn("w", w1)
        .join(unigram_c, "w")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "cost_ubits",
            F.round(
                -F.log2(
                    (F.col("c2") + 1) / (F.col("c1") + F.col("v"))
                )
                * QUANT
            ).cast("bigint"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("cost_ubits").alias("ubits"),
    )


def _bits_col() -> F.Column:
    """bits-per-bigram from the exact integer totals — shared by the
    per-doc and per-bucket queries so a threshold/rounding change
    cannot diverge them."""
    return F.round(F.col("ubits") / F.col("n_bigrams") / QUANT, 4)


def _bucket_col(bits: F.Column) -> F.Column:
    return (
        F.when(bits <= HEAD_MAX_BITS, "head")
        .when(bits <= MIDDLE_MAX_BITS, "middle")
        .otherwise("tail")
    )


def lm_doc_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bits-per-bigram under the corpus bigram LM, plus
    the CCNet-style bucket."""
    per_doc = _per_doc_ubits(spark, sf_dir)
    bits = _bits_col()
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        bits.alias("bits_per_bigram"),
        _bucket_col(bits).alias("lm_bucket"),
    ).orderBy("doc_id")


def lm_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-level head/middle/tail distribution — the number a
    curation run reports before choosing its keep thresholds.

    avg_bits is the bigram-weighted mean computed from the EXACT
    integer micro-bit sums (sum(ubits)/sum(n_bigrams)) — a plain
    avg() over per-doc doubles would be accumulation-order sensitive
    under the spread read."""
    d = _per_doc_ubits(spark, sf_dir)
    return (
        d.withColumn("lm_bucket", _bucket_col(_bits_col()))
        .groupBy("lm_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ubits").alias("_u"),
            F.sum("n_bigrams").alias("_n"),
        )
        .select(
            "lm_bucket",
            "n_docs",
            F.round(F.col("_u") / F.col("_n") / QUANT, 4).alias("avg_bits"),
        )
        .orderBy("lm_bucket")
    )


QUERIES = {
    "lm_doc_bits": lm_doc_bits,
    "lm_bucket_counts": lm_bucket_counts,
}

_DOC_BITS_SQL = f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    bg AS (
        SELECT doc_id, unnest({shingles_duck("toks", 2)}) AS bg
        FROM t WHERE len(toks) >= 2
    ),
    bigram_c AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
    uni AS (SELECT doc_id, unnest(toks) AS w FROM t),
    unigram_c AS (SELECT w, count(*) AS c1 FROM uni GROUP BY w),
    vv AS (SELECT count(DISTINCT w) AS v FROM uni),
    scored AS (
        SELECT bg.doc_id,
               CAST(round(-log2((c2 + 1) / (c1 + v)) * {QUANT})
                    AS BIGINT) AS cost_ubits
        FROM bg
        JOIN bigram_c USING (bg)
        JOIN unigram_c ON unigram_c.w = string_split(bg.bg, ' ')[1]
        CROSS JOIN vv
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(sum(cost_ubits) AS BIGINT) AS ubits
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams,
           round(ubits / n_bigrams / {QUANT}, 4) AS bits_per_bigram,
           CASE
               WHEN round(ubits / n_bigrams / {QUANT}, 4)
                    <= {HEAD_MAX_BITS} THEN 'head'
               WHEN round(ubits / n_bigrams / {QUANT}, 4)
                    <= {MIDDLE_MAX_BITS} THEN 'middle'
               ELSE 'tail'
           END AS lm_bucket
    FROM per_doc
"""

ORACLES = {
    "lm_doc_bits": f"{_DOC_BITS_SQL} ORDER BY doc_id",
    "lm_bucket_counts": f"""
        WITH d AS ({_DOC_BITS_SQL.replace(
            "SELECT doc_id, n_bigrams,",
            "SELECT doc_id, n_bigrams, ubits,", 1)})
        SELECT lm_bucket, count(*) AS n_docs,
               round(CAST(sum(ubits) AS BIGINT)
                     / CAST(sum(n_bigrams) AS BIGINT) / {QUANT}, 4)
                   AS avg_bits
        FROM d GROUP BY lm_bucket ORDER BY lm_bucket
    """,
}
