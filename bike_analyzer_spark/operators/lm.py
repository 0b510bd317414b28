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

#: Bucket grid: each doc's score lands on an integer 0.1-milli-bit
#: grid, gb = (ubits * GRID_PER_BIT) div (n_bigrams * QUANT) — pure
#: bigint math, so the grid value and the tercile cuts derived from it
#: are bit-identical cross-engine (no float in any bucketing
#: decision). The head/middle/tail cuts are the corpus's OWN gb
#: terciles (CCNet buckets at corpus perplexity terciles), computed
#: per run from a grid-sized histogram — r6 hard-coded the sf0.01
#: tercile bits values, which degenerated on any corpus whose score
#: distribution shifts (r6 VERDICT ask #5).
GRID_PER_BIT = 10_000


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


def _per_doc_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, ubits, lm_bucket): per-doc totals with the
    CCNet bucket assigned at the corpus's own gb terciles.

    The cuts come from a histogram over the integer grid value: the
    groupBy collapses the corpus to at most |gb range| rows, so the
    rank scan below (a cumulative window + 1-row aggregate) runs over
    a GRID-sized frame regardless of corpus size — the same
    bounded-state discipline as scale.grid_quantiles, but on an
    integer grid with exact ceil-rank semantics (cut = smallest gb
    whose cumulative count reaches ceil(n/3) / ceil(2n/3)), so both
    engines derive bit-identical cuts. per_doc materializes once and
    feeds both the histogram and the verdict join."""
    per_doc = (
        _per_doc_ubits(spark, sf_dir)
        .withColumn(
            "gb",
            F.expr(f"(ubits * {GRID_PER_BIT}) div (n_bigrams * {QUANT})"),
        )
        .localCheckpoint(eager=False)
    )
    hist = per_doc.groupBy("gb").agg(F.count(F.lit(1)).alias("_c"))
    from pyspark.sql import Window

    cum = hist.withColumn(
        "_cum",
        F.sum("_c").over(
            Window.orderBy("gb").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    ).withColumn("_n", F.sum("_c").over(Window.partitionBy(F.lit(1))))
    cuts = cum.select(
        F.min(
            F.when(F.col("_cum") >= F.expr("(_n + 2) div 3"), F.col("gb"))
        ).alias("_cut1"),
        F.min(
            F.when(
                F.col("_cum") >= F.expr("(2 * _n + 2) div 3"), F.col("gb")
            )
        ).alias("_cut2"),
    )
    return (
        per_doc.crossJoin(F.broadcast(cuts))
        .withColumn(
            "lm_bucket",
            F.when(F.col("gb") <= F.col("_cut1"), "head")
            .when(F.col("gb") <= F.col("_cut2"), "middle")
            .otherwise("tail"),
        )
        .drop("gb", "_cut1", "_cut2")
    )


def lm_doc_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bits-per-bigram under the corpus bigram LM, plus
    the CCNet-style bucket at the corpus's own terciles."""
    per_doc = _per_doc_bucketed(spark, sf_dir)
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        _bits_col().alias("bits_per_bigram"),
        "lm_bucket",
    ).orderBy("doc_id")


def lm_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-level head/middle/tail distribution — the number a
    curation run reports before choosing its keep thresholds.

    avg_bits is the bigram-weighted mean computed from the EXACT
    integer micro-bit sums (sum(ubits)/sum(n_bigrams)) — a plain
    avg() over per-doc doubles would be accumulation-order sensitive
    under the spread read."""
    return (
        _per_doc_bucketed(spark, sf_dir)
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


#: Interpolated Kneser-Ney cost in integer micro-bits, as ONE shared
#: expression text both engines evaluate (per-row scalar — no
#: accumulation, so IEEE determinism needs only identical text).
#: With absolute discount D = 3/4 and all corpus bigrams observed
#: (c2 >= 1, so the max(c2 - D, 0) clamp never binds):
#:
#:   P_KN(w2|w1) = (c2 - 3/4)/c1 + (3/4)(n1p_w1/c1)(n1p_w2/n1p_all)
#:               = [(4*c2 - 3)*n1p_all + 3*n1p_w1*n1p_w2]
#:                 / (4*c1*n1p_all)
#:
#: where c1 = sum_w2 c(w1 w2) (w1's count AS A HISTORY), n1p_w1 =
#: |{w2 : c(w1 w2) > 0}| (distinct continuations), n1p_w2 =
#: |{w1 : c(w1 w2) > 0}| (distinct histories — the continuation
#: probability's numerator), n1p_all = distinct bigram types.  Every
#: leaf is cast to DOUBLE before arithmetic so both engines follow
#: the same IEEE promotion; at test scale the products are < 2^53
#: and therefore exact, at larger scale the representation error is
#: absorbed by the same micro-bit quantization ulp class the add-one
#: model accepts (module docstring).
_KN_COST_EXPR = (
    f"CAST(round((log2(4 * CAST(c1 AS DOUBLE) * CAST(n1p_all AS DOUBLE))"
    f" - log2((4 * CAST(c2 AS DOUBLE) - 3) * CAST(n1p_all AS DOUBLE)"
    f" + 3 * CAST(n1p_w1 AS DOUBLE) * CAST(n1p_w2 AS DOUBLE)))"
    f" * {QUANT}) AS BIGINT)"
)


def lm_kn_doc_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bits-per-bigram under an interpolated KNESER-NEY
    bigram LM (Kneser & Ney 1995; the Chen & Goodman 1998 interpolated
    form with a fixed D = 3/4 discount) — the standard n-gram
    smoothing, complementing `lm_doc_bits`' add-one model: add-one
    hammers every unseen mass estimate with V, while KN redistributes
    exactly D per observed type and backs off to CONTINUATION
    probability (how many contexts a word follows, not how often it
    occurs — the "San Francisco" effect: "Francisco" is frequent but
    predicts poorly in new contexts).

    Scoring the corpus under its own model means every doc bigram is
    observed, so the discount clamp never binds and all three joins
    are inner and lossless.

    Scale shape: one corpus bigram explode feeding one vocab-sized
    type table (materialized lazily once for its three consumers),
    two vocab-sized rollups of THAT TABLE (history and continuation
    stats — never a second corpus pass), a 1-row type-count
    broadcast, three vocab-keyed joins back onto the exploded corpus
    (AQE picks broadcast while the vocab fits), one per-doc
    aggregate. LM state grows with vocabulary, not corpus rows.
    """
    docs = load(spark, sf_dir, "documents")
    bg = _doc_bigrams(docs).localCheckpoint(eager=False)
    typ = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=False)
    )
    w1 = F.split(F.col("bg"), " ")[0]
    w2 = F.split(F.col("bg"), " ")[1]
    hist = (
        typ.withColumn("w1", w1)
        .groupBy("w1")
        .agg(
            F.sum("c2").alias("c1"),
            F.count(F.lit(1)).alias("n1p_w1"),
        )
    )
    cont = (
        typ.withColumn("w2", w2)
        .groupBy("w2")
        .agg(F.count(F.lit(1)).alias("n1p_w2"))
    )
    tot = typ.agg(F.count(F.lit(1)).alias("n1p_all"))
    scored = (
        bg.join(typ, "bg")
        .withColumn("w1", w1)
        .withColumn("w2", w2)
        .join(hist, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .withColumn("cost_ubits", F.expr(_KN_COST_EXPR))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("cost_ubits").alias("ubits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            _bits_col().alias("kn_bits_per_bigram"),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "lm_doc_bits": lm_doc_bits,
    "lm_bucket_counts": lm_bucket_counts,
    "lm_kn_doc_bits": lm_kn_doc_bits,
}

#: shared CTE chain ending in `bucketed(doc_id, n_bigrams, ubits,
#: bits_per_bigram, lm_bucket)` — the tercile cuts mirror
#: _per_doc_bucketed's integer rank math op-for-op
_BUCKETED_CTES = f"""
    t AS (
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
               CAST(sum(cost_ubits) AS BIGINT) AS ubits,
               (CAST(sum(cost_ubits) AS BIGINT) * {GRID_PER_BIT})
                   // (count(*) * {QUANT}) AS gb
        FROM scored GROUP BY doc_id
    ),
    hist AS (SELECT gb, count(*) AS c FROM per_doc GROUP BY gb),
    cum AS (
        SELECT gb,
               CAST(sum(c) OVER (ORDER BY gb) AS BIGINT) AS cum,
               CAST(sum(c) OVER () AS BIGINT) AS n
        FROM hist
    ),
    cuts AS (
        SELECT
            min(CASE WHEN cum >= (n + 2) // 3 THEN gb END) AS cut1,
            min(CASE WHEN cum >= (2 * n + 2) // 3 THEN gb END) AS cut2
        FROM cum
    ),
    bucketed AS (
        SELECT doc_id, n_bigrams, ubits,
               round(ubits / n_bigrams / {QUANT}, 4) AS bits_per_bigram,
               CASE
                   WHEN gb <= cut1 THEN 'head'
                   WHEN gb <= cut2 THEN 'middle'
                   ELSE 'tail'
               END AS lm_bucket
        FROM per_doc CROSS JOIN cuts
    )
"""

ORACLES = {
    "lm_doc_bits": f"""
        WITH {_BUCKETED_CTES}
        SELECT doc_id, n_bigrams, bits_per_bigram, lm_bucket
        FROM bucketed ORDER BY doc_id
    """,
    "lm_bucket_counts": f"""
        WITH {_BUCKETED_CTES}
        SELECT lm_bucket, count(*) AS n_docs,
               round(CAST(sum(ubits) AS BIGINT)
                     / CAST(sum(n_bigrams) AS BIGINT) / {QUANT}, 4)
                   AS avg_bits
        FROM bucketed GROUP BY lm_bucket ORDER BY lm_bucket
    """,
    "lm_kn_doc_bits": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        bg AS (
            SELECT doc_id, unnest({shingles_duck("toks", 2)}) AS bg
            FROM t WHERE len(toks) >= 2
        ),
        typ AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
        hist AS (
            SELECT string_split(bg, ' ')[1] AS w1,
                   CAST(sum(c2) AS BIGINT) AS c1,
                   count(*) AS n1p_w1
            FROM typ GROUP BY 1
        ),
        cont AS (
            SELECT string_split(bg, ' ')[2] AS w2, count(*) AS n1p_w2
            FROM typ GROUP BY 1
        ),
        tot AS (SELECT count(*) AS n1p_all FROM typ),
        scored AS (
            SELECT bg.doc_id, {_KN_COST_EXPR} AS cost_ubits
            FROM bg
            JOIN typ USING (bg)
            JOIN hist ON hist.w1 = string_split(bg.bg, ' ')[1]
            JOIN cont ON cont.w2 = string_split(bg.bg, ' ')[2]
            CROSS JOIN tot
        ),
        per_doc AS (
            SELECT doc_id, count(*) AS n_bigrams,
                   CAST(sum(cost_ubits) AS BIGINT) AS ubits
            FROM scored GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams,
               round(ubits / n_bigrams / {QUANT}, 4) AS kn_bits_per_bigram
        FROM per_doc ORDER BY doc_id
    """,
}
