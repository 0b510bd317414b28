"""Corpus vocabulary statistics over `documents` — the profile a
training-data pipeline reads before committing to a tokenizer or
filter thresholds: vocabulary size, hapax mass (Zipf tail), type-
token ratio, and the rank-frequency head (the Zipf curve's visible
part).

Complements the existing text surfaces: `text_stats` is per-document,
`tfidf_top_terms` is per-document salience; this is the CORPUS-level
roll-up.

Scale shape: one token explode collapsed by a map-side partial
aggregate into the vocabulary-sized (term, freq) table; everything
downstream is vocabulary-sized (grows ~Heaps' law, far sublinear in
corpus bytes). The summary is a 1-row aggregate; the head is a
bounded TakeOrderedAndProject. Frequency shares are integer ppm
(round(freq * 1e6 / total)) so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import tokens
from ..sources.catalog import load

_TOKS = "string_split_regex(trim(text), '\\s+')"

#: bounded Zipf head size
TOP_TERMS = 25


def _term_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, freq): the vocabulary-sized term table."""
    return (
        load(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def vocab_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus profile: doc count, token count, vocabulary
    size, hapax count (freq-1 terms), and the type-token ratio."""
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    stats = _term_freqs(spark, sf_dir).agg(
        F.sum("freq").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).alias(
            "hapax_count"
        ),
    )
    return stats.crossJoin(F.broadcast(n_docs)).select(
        "n_docs",
        "total_tokens",
        "vocab_size",
        "hapax_count",
        F.round(F.col("vocab_size") / F.col("total_tokens"), 6).alias(
            "type_token_ratio"
        ),
    )


def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOP_TERMS most frequent terms with their integer-ppm share
    of the corpus — the Zipf head, deterministically ranked (freq
    desc, term asc)."""
    tf = _term_freqs(spark, sf_dir)
    total = tf.agg(F.sum("freq").alias("total"))
    ranked = (
        tf.crossJoin(F.broadcast(total))
        .select(
            "w",
            "freq",
            F.round(F.col("freq") * 1_000_000 / F.col("total"))
            .cast("bigint")
            .alias("ppm"),
        )
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(TOP_TERMS)
    )
    return ranked


QUERIES = {
    "vocab_summary": vocab_summary,
    "vocab_top_terms": vocab_top_terms,
}

_TF_CTE = f"""
    tf AS (
        SELECT w, count(*) AS freq
        FROM (SELECT unnest({_TOKS}) AS w FROM documents)
        GROUP BY w
    )
"""

ORACLES = {
    "vocab_summary": f"""
        WITH {_TF_CTE}
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               CAST(sum(freq) AS BIGINT) AS total_tokens,
               count(*) AS vocab_size,
               CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax_count,
               round(count(*) / CAST(sum(freq) AS BIGINT), 6)
                   AS type_token_ratio
        FROM tf
    """,
    "vocab_top_terms": f"""
        WITH {_TF_CTE}
        SELECT w, freq,
               CAST(round(freq * 1000000
                          / (SELECT CAST(sum(freq) AS BIGINT) FROM tf))
                    AS BIGINT) AS ppm
        FROM tf
        ORDER BY freq DESC, w ASC
        LIMIT {TOP_TERMS}
    """,
}


#: collocation report bounds: min pair frequency, head size
MIN_PAIR_FREQ = 5
TOP_BIGRAMS = 20

#: micro-nat PMI of an adjacent-token bigram against the unigram
#: model: p(w1,w2)=c12/B, p(w)=c/T, so PMI = ln(c12*T*T/(B*c1*c2)).
#: Quantized ONCE via a shared-text IEEE-double expression (the
#: dsir/lm micro-nat discipline) — the operand is built from doubles
#: so no integer product can overflow at any corpus size.
_PMI_UNATS = (
    "CAST(round(ln(CAST(c12 AS DOUBLE)"
    " * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)"
    " / (CAST(b AS DOUBLE) * CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))"
    " * 1000000) AS BIGINT)"
)

_BIGRAM_FINAL = [
    "w1",
    "w2",
    "c12",
    "c1",
    "c2",
    f"{_PMI_UNATS} AS pmi_unats",
    f"CAST({_PMI_UNATS} AS DOUBLE) / CAST(1000000 AS DOUBLE) AS pmi",
]


def vocab_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOP_BIGRAMS strongest adjacent-token collocations by PMI
    (min pair count MIN_PAIR_FREQ) — the phrase-detection pass a
    tokenizer/word2vec pipeline runs before training, and the
    natural companion of the Zipf head above.

    Scale shape: the bigram explode collapses map-side into the
    (w1, w2, c12) table (Heaps-sublinear, like the unigram table);
    the unigram joins are vocabulary-sized broadcasts; T and B are
    1-row broadcast scalars; the head is a bounded
    TakeOrderedAndProject with a full deterministic tiebreak
    (pmi desc, c12 desc, w1, w2)."""
    docs = load(spark, sf_dir, "documents").select(
        tokens("text").alias("t")
    )
    bigrams = (
        docs.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1),"
                    " slice(t, 2, size(t) - 1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    tf = _term_freqs(spark, sf_dir).localCheckpoint(eager=False)
    totals = tf.agg(F.sum("freq").alias("t")).crossJoin(
        F.broadcast(bigrams.agg(F.sum("c12").alias("b")))
    )
    c1 = tf.select(F.col("w").alias("w1"), F.col("freq").alias("c1"))
    c2 = tf.select(F.col("w").alias("w2"), F.col("freq").alias("c2"))
    return (
        bigrams.where(F.col("c12") >= MIN_PAIR_FREQ)
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(totals))
        .selectExpr(*_BIGRAM_FINAL)
        .orderBy(
            F.desc("pmi_unats"), F.desc("c12"), F.asc("w1"), F.asc("w2")
        )
        .limit(TOP_BIGRAMS)
    )


QUERIES["vocab_bigram_pmi"] = vocab_bigram_pmi

ORACLES["vocab_bigram_pmi"] = f"""
    WITH {_TF_CTE},
    bg AS (
        SELECT t[k] AS w1, t[k + 1] AS w2, count(*) AS c12
        FROM (SELECT {_TOKS} AS t FROM documents),
             unnest(range(1, len(t))) u(k)
        GROUP BY 1, 2
    ),
    totals AS (
        SELECT (SELECT CAST(sum(freq) AS BIGINT) FROM tf) AS t,
               (SELECT CAST(sum(c12) AS BIGINT) FROM bg) AS b
    )
    SELECT {', '.join(_BIGRAM_FINAL)}
    FROM (
        SELECT bg.w1, bg.w2, bg.c12,
               cx.freq AS c1, cy.freq AS c2, totals.t, totals.b
        FROM bg
        JOIN tf cx ON cx.w = bg.w1
        JOIN tf cy ON cy.w = bg.w2
        CROSS JOIN totals
        WHERE bg.c12 >= {MIN_PAIR_FREQ}
    )
    ORDER BY pmi_unats DESC, c12 DESC, w1 ASC, w2 ASC
    LIMIT {TOP_BIGRAMS}
"""


#: micro-unit quantizer for the octave fit's log2 ordinate (the
#: dsir/lm discipline: ONE transcendental quantization per value)
_L2Q = "CAST(round(log2(CAST({} AS DOUBLE)) * 1000000) AS BIGINT)"

#: OLS slope / r^2 over the integer octave sums, shared verbatim —
#: x = octave index (exact int), y = micro-quantized log2(term count)
_D2 = "CAST({} AS DOUBLE)"
_SLOPE_NUM = (
    f"({_D2.format('n')} * {_D2.format('sxy')}"
    f" - {_D2.format('sx')} * {_D2.format('sy')})"
)
_SLOPE_DEN = (
    f"({_D2.format('n')} * {_D2.format('sxx')}"
    f" - {_D2.format('sx')} * {_D2.format('sx')})"
)
_Y_VAR = (
    f"({_D2.format('n')} * {_D2.format('syy')}"
    f" - {_D2.format('sy')} * {_D2.format('sy')})"
)


def vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law (Zipf) exponent of the corpus term distribution,
    WITHOUT ranking the vocabulary: bucket terms by frequency
    OCTAVE (k = floor(log2 f) — exact even at octave boundaries,
    since log2 of a power of two is exact in IEEE doubles), then
    OLS of log2(#terms in octave) on k. Under Zipf with exponent s
    the octave counts decay as 2^(-k/s), so s = -1/slope; r^2 says
    how power-law the corpus really is. The rank-frequency
    regression every NLP textbook draws needs a corpus-wide total
    order over the vocabulary — a global sort this engine bans —
    while the octave histogram is one map-side aggregate to <=32
    rows at ANY corpus size.

    Exactness: octave term-counts are exact integers; each log2 is
    quantized ONCE to integer micro-units; the OLS power sums are
    exact integer sums over <=32 rows; slope/exponent/r^2 are
    shared-text IEEE expressions over those integers.

    On the synthetic corpus the verdict is honestly "not Zipf": the
    31-word vocabulary occupies two octaves with POSITIVE slope, so
    zipf_exponent is NULL (guarded: the exponent only exists for a
    decaying octave profile) — exactly the readout that tells a
    pipeline its tokenizer corpus is unnatural."""
    tf = _term_freqs(spark, sf_dir)
    oct_ = tf.selectExpr(
        "CAST(floor(log2(CAST(freq AS DOUBLE))) AS INT) AS k"
    ).groupBy("k").agg(F.count(F.lit(1)).alias("n_terms"))
    pts = oct_.selectExpr(
        "CAST(k AS BIGINT) AS x", _L2Q.format("n_terms") + " AS y"
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    return sums.selectExpr(
        "n AS n_octaves",
        f"CASE WHEN n > 1 AND {_SLOPE_DEN} > 0 THEN"
        f" {_SLOPE_NUM} / {_SLOPE_DEN} / CAST(1000000 AS DOUBLE)"
        " END AS slope",
        f"CASE WHEN n > 1 AND {_SLOPE_DEN} > 0 AND {_SLOPE_NUM} < 0"
        f" THEN CAST(-1000000 AS DOUBLE) * {_SLOPE_DEN} / {_SLOPE_NUM}"
        " END AS zipf_exponent",
        f"CASE WHEN n > 1 AND {_SLOPE_DEN} > 0 AND {_Y_VAR} > 0 THEN"
        f" {_SLOPE_NUM} * {_SLOPE_NUM} / ({_SLOPE_DEN} * {_Y_VAR})"
        " END AS r2",
    )


QUERIES["vocab_zipf_fit"] = vocab_zipf_fit

ORACLES["vocab_zipf_fit"] = f"""
    WITH {_TF_CTE},
    oct AS (
        SELECT CAST(floor(log2(CAST(freq AS DOUBLE))) AS INT) AS k,
               count(*) AS n_terms
        FROM tf GROUP BY 1
    ),
    pts AS (
        SELECT CAST(k AS BIGINT) AS x,
               {_L2Q.format('n_terms')} AS y
        FROM oct
    ),
    sums AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM pts
    )
    SELECT n AS n_octaves,
           CASE WHEN n > 1 AND {_SLOPE_DEN} > 0 THEN
               {_SLOPE_NUM} / {_SLOPE_DEN} / CAST(1000000 AS DOUBLE)
           END AS slope,
           CASE WHEN n > 1 AND {_SLOPE_DEN} > 0 AND {_SLOPE_NUM} < 0
               THEN CAST(-1000000 AS DOUBLE) * {_SLOPE_DEN}
                    / {_SLOPE_NUM}
           END AS zipf_exponent,
           CASE WHEN n > 1 AND {_SLOPE_DEN} > 0 AND {_Y_VAR} > 0 THEN
               {_SLOPE_NUM} * {_SLOPE_NUM}
               / ({_SLOPE_DEN} * {_Y_VAR})
           END AS r2
    FROM sums
"""


#: Heaps-curve resolution: corpus-prefix checkpoints at 10%..100%
HEAPS_DECILES = 10


def vocab_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct 3-token-shingle
    vocabulary vs corpus size at ten corpus-prefix checkpoints
    (docs ordered by doc_id; testdata ids are dense 0..n-1, asserted
    in tests/test_setjoin-adjacent contract tests). Shingles, not
    words: the word vocabulary of this synthetic corpus saturates in
    the first documents, while the shingle space keeps growing — the
    regime Heaps' V(N) = K*N^beta describes.

    Scale shape — the cumulative-distinct pattern with NO doc-global
    window and NO 10x fan-out join: each shingle contributes one row
    to a vocabulary-sized (first_doc) aggregate, each doc one row to
    a doc-count-sized occurrence aggregate; both collapse to their
    FIRST-INCLUDING decile by pure integer arithmetic
    (d = (10*(id+1) + n - 1) div n, from the 1-row broadcast doc
    count), and the curve is a cumulative sum over the 10-row decile
    lattice. Output rows carry exact integers only; the beta fit is
    left to the consumer (pytest asserts 0 < beta < 1 on log-log
    deltas).
    """
    from ..functions.textfns import shingle_exprs

    docs = load(spark, sf_dir, "documents")
    n1 = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    sh = (
        docs.withColumn("toks", tokens("text"))
        .select("doc_id", F.explode(shingle_exprs("toks", 3)).alias("sh"))
    )
    dec = f"(({HEAPS_DECILES} * (doc_id + 1) + n_docs - 1) div n_docs)"
    # vocabulary-sized: first doc containing each distinct shingle
    vocab_d = (
        sh.groupBy("sh")
        .agg(F.min("doc_id").alias("doc_id"))
        .crossJoin(F.broadcast(n1))
        .groupBy(F.expr(dec).alias("d"))
        .agg(F.count(F.lit(1)).alias("new_vocab"))
    )
    # doc-count-sized: shingle occurrences per doc -> per decile
    occ_d = (
        sh.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("occ"))
        .crossJoin(F.broadcast(n1))
        .groupBy(F.expr(dec).alias("d"))
        .agg(F.sum("occ").alias("new_occ"))
    )
    lattice = spark.range(1, HEAPS_DECILES + 1).select(
        F.col("id").cast("int").alias("d")
    )
    cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        lattice.join(vocab_d, "d", "left")
        .join(occ_d, "d", "left")
        .crossJoin(F.broadcast(n1))
        .select(
            (F.col("d") * (100 // HEAPS_DECILES)).alias("pct"),
            F.expr(f"(d * n_docs) div {HEAPS_DECILES}").alias("docs_seen"),
            F.sum(F.coalesce(F.col("new_occ"), F.lit(0)))
            .over(cum)
            .alias("shingles_seen"),
            F.sum(F.coalesce(F.col("new_vocab"), F.lit(0)))
            .over(cum)
            .alias("vocab_seen"),
        )
        .orderBy("pct")
    )


QUERIES["vocab_heaps_curve"] = vocab_heaps_curve

_SHINGLES_CTE = f"""
    sh AS (
        SELECT doc_id, unnest(
            CASE WHEN len(toks) >= 3 THEN
                list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(toks[i:i+2], ' '))
            ELSE [] END) AS sh
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    ),
    n1 AS (SELECT count(*) AS n_docs FROM documents)
"""

_DEC = "((10 * (doc_id + 1) + n_docs - 1) // n_docs)"

ORACLES["vocab_heaps_curve"] = f"""
    WITH {_SHINGLES_CTE},
    vocab_d AS (
        SELECT {_DEC} AS d, count(*) AS new_vocab
        FROM (SELECT sh, min(doc_id) AS doc_id FROM sh GROUP BY sh), n1
        GROUP BY 1
    ),
    occ_d AS (
        SELECT {_DEC} AS d, CAST(sum(occ) AS BIGINT) AS new_occ
        FROM (SELECT doc_id, count(*) AS occ FROM sh GROUP BY doc_id), n1
        GROUP BY 1
    ),
    lattice AS (SELECT CAST(unnest(range(1, 11)) AS INT) AS d)
    SELECT 10 * d AS pct,
           (d * n_docs) // 10 AS docs_seen,
           CAST(sum(coalesce(new_occ, 0)) OVER w AS BIGINT)
               AS shingles_seen,
           CAST(sum(coalesce(new_vocab, 0)) OVER w AS BIGINT)
               AS vocab_seen
    FROM lattice
    LEFT JOIN vocab_d USING (d)
    LEFT JOIN occ_d USING (d)
    CROSS JOIN n1
    WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)
    ORDER BY pct
"""
