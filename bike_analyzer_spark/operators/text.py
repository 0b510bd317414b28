"""Text analysis over the `documents` table — the LLM-data-pipeline
text pack (builder brief: language-ID heuristic, quality scoring,
token counting, document fingerprinting).

Everything is native column algebra (split / transform / filter /
aggregate lambdas) — zero Python UDFs, so the whole pack stays inside
whole-stage codegen and scales as a single narrow projection +
(for fingerprints) one map-side array fold per row. No shuffles at
all except the final orderBy in topk-style outputs.

100 TB notes: all queries here are embarrassingly parallel per-row
scans; the only state is the per-row token array (bounded by doc
length). Skew-free by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import hash64_duck, shingle_exprs, shingles_duck, tokens
from ..sources.catalog import load

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")
# marker tokens for the n-gram-free language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "a", "is", "and"),
    "pt": ("de", "que", "e", "da"),
}


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def with_tokens(docs: DataFrame) -> DataFrame:
    return docs.withColumn("toks", tokens("text"))


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality ratios per document.

    quality_score = min(1, n_tokens/50) * (1 - stopword_ratio):
    favors long documents that aren't stopword soup. Deterministic,
    same arithmetic text on both engines.
    """
    docs = with_tokens(load(spark, sf_dir, "documents"))
    n_tok = F.size("toks")
    stop_hits = F.size(
        F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS))
    )
    alpha_len = F.length(F.regexp_replace("text", "[^a-z]", ""))
    stop_ratio = stop_hits / n_tok
    # counts cast to bigint: DuckDB's len()/length() are BIGINT and the
    # driver's value hash is type-sensitive
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_m"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(F.length("text") / n_tok, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(alpha_len / F.length("text"), 4).alias("alpha_ratio"),
        F.round(
            F.least(F.lit(1.0), n_tok / F.lit(50.0)) * (F.lit(1.0) - stop_ratio),
            4,
        ).alias("quality_score"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic: count marker hits per
    language, predict the best-scoring language above a 2-hit floor,
    else 'und'. Ties broken by language code order (en before pt)."""
    docs = with_tokens(load(spark, sf_dir, "documents"))
    hits = {
        code: F.size(F.filter(F.col("toks"), lambda t: t.isin(*markers)))
        for code, markers in LANG_MARKERS.items()
    }
    pred = (
        F.when(
            (hits["en"] >= 2) & (hits["en"] >= hits["pt"]), F.lit("en")
        )
        .when(hits["pt"] >= 2, F.lit("pt"))
        .otherwise(F.lit("und"))
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        hits["en"].cast("bigint").alias("en_hits"),
        hits["pt"].cast("bigint").alias("pt_hits"),
        pred.alias("lang_pred"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: minimum portable hash over 3-token
    shingles (a 1-permutation MinHash — the rolling-hash fingerprint
    of the brief, and the primitive dedup_minhash generalizes)."""
    docs = with_tokens(load(spark, sf_dir, "documents"))
    sh = shingle_exprs("toks", n=3)
    hashes = F.transform(
        sh,
        lambda s: F.conv(
            F.substring(F.md5(F.encode(s, "UTF-8")), 1, 8), 16, 10
        ).cast("bigint"),
    )
    return docs.select(
        "doc_id",
        F.size(sh).cast("bigint").alias("n_shingles"),
        F.array_min(hashes).alias("fingerprint"),
    )


_TOKS = "string_split_regex(trim(text), '\\s+')"

# BPE-ish pre-tokenization pattern (GPT-2-style classes, WITHOUT the
# lookahead clauses — RE2 (DuckDB) has no lookahead, so the pattern is
# restricted to the subset both engines interpret identically):
# contractions, space-prefixed letter runs, digit runs, punctuation
# runs, whitespace runs.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"


def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both ways the brief asks for: whitespace split
    and a BPE-ish regex pre-tokenizer (the piece-count proxy used for
    budget estimates in training pipelines). chars_per_bpe_token is
    the compression-ratio quality signal."""
    docs = with_tokens(load(spark, sf_dir, "documents"))
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
    n_bpe = F.size(
        F.filter(bpe, lambda t: ~t.rlike(r"^\s+$"))  # drop pure-space runs
    )
    return docs.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_ws_tokens"),
        n_bpe.cast("bigint").alias("n_bpe_tokens"),
        F.round(F.length("text") / n_bpe, 4).alias("chars_per_bpe_token"),
    )


QUERIES = {
    "text_stats": text_stats,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "text_bpe_tokens": text_bpe_tokens,
}

ORACLES = {
    "text_stats": f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
        SELECT doc_id,
               length(text) AS n_chars_m,
               len(toks) AS n_tokens,
               round(length(text) / len(toks), 4) AS avg_token_len,
               round(len(list_filter(toks,
                   x -> x IN ({_sql_list(STOPWORDS)}))) / len(toks), 4)
                   AS stopword_ratio,
               round(length(regexp_replace(text, '[^a-z]', '', 'g'))
                   / length(text), 4) AS alpha_ratio,
               round(least(1.0, len(toks) / 50.0)
                   * (1.0 - len(list_filter(toks,
                       x -> x IN ({_sql_list(STOPWORDS)}))) / len(toks)), 4)
                   AS quality_score
        FROM t
    """,
    "text_langid": f"""
        WITH t AS (
            SELECT doc_id, lang,
                   len(list_filter({_TOKS},
                       x -> x IN ({_sql_list(LANG_MARKERS["en"])}))) AS en_hits,
                   len(list_filter({_TOKS},
                       x -> x IN ({_sql_list(LANG_MARKERS["pt"])}))) AS pt_hits
            FROM documents
        )
        SELECT doc_id, lang AS lang_true, en_hits, pt_hits,
               CASE WHEN en_hits >= 2 AND en_hits >= pt_hits THEN 'en'
                    WHEN pt_hits >= 2 THEN 'pt'
                    ELSE 'und' END AS lang_pred
        FROM t
    """,
    "text_bpe_tokens": f"""
        WITH t AS (
            SELECT doc_id, text,
                   len(list_filter(
                       regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}', 0),
                       x -> NOT regexp_matches(x, '^\\s+$')
                   )) AS n_bpe
            FROM documents
        )
        SELECT doc_id,
               len({_TOKS}) AS n_ws_tokens,
               n_bpe AS n_bpe_tokens,
               round(length(text) / n_bpe, 4) AS chars_per_bpe_token
        FROM t JOIN documents USING (doc_id, text)
    """,
    "text_fingerprint": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (SELECT doc_id, {shingles_duck("toks", 3)} AS sh FROM t)
        SELECT doc_id,
               len(sh) AS n_shingles,
               list_min(list_transform(sh, x -> {hash64_duck("x")}))
                   AS fingerprint
        FROM s
    """,
}
