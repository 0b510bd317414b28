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

from pyspark.sql import DataFrame, SparkSession
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
