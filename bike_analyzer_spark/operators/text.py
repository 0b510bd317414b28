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

# Learned BPE merge table (scripts/learn_bpe.py at sf0.01, 16 merges):
# deterministic greedy frequency-ranked byte-pair merges over the
# whitespace-token corpus — rerun the script to audit the constant.
# Applied IN ORDER; earlier merges feed later ones (e.g. 'h'+'ash'
# consumes the output of 'as'+'h').
BPE_MERGES = (
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
)

# Symbol-sequence string encoding: every symbol is wrapped \x02sym\x03,
# so merge (a, b) is the LITERAL replace \x02a\x03\x02b\x03 →
# \x02ab\x03. Left-to-right non-overlapping replace (Spark `replace`,
# DuckDB `replace`) over this encoding is EXACTLY greedy-leftmost BPE:
# matches can only align on whole symbols (the wrapper chars never
# appear inside a symbol), and adjacent matches share no characters
# (each symbol carries its own delimiters), so [a,b,a,b] → [ab,ab].
_L, _R = "\x02", "\x03"


def _bpe_rep(text_col) -> F.Column:
    """The wrapped-symbol encoding of `text_col` AFTER applying
    BPE_MERGES in order: \\x02sym\\x03 per piece. Whitespace chars
    are symbols too (never merged — no merge contains whitespace), so
    merges cannot cross token boundaries and per-token BPE falls out
    of one whole-text pipeline. Pure string algebra, codegen-friendly."""
    clean = F.regexp_replace(text_col, "[\\x02\\x03]", "")
    rep = F.regexp_replace(clean, r"([\s\S])", _L + "$1" + _R)
    for a, b in BPE_MERGES:
        rep = F.replace(rep, F.lit(_L + a + _R + _L + b + _R), F.lit(_L + a + b + _R))
    return rep


def _bpe_pieces(text_col) -> tuple:
    """(total_symbols, whitespace_symbols) after applying BPE_MERGES
    to the wrapped-character encoding of `text_col`."""
    clean = F.regexp_replace(text_col, "[\\x02\\x03]", "")
    rep = _bpe_rep(text_col)
    n_sym = F.length(rep) - F.length(F.replace(rep, F.lit(_L), F.lit("")))
    n_ws = F.length(clean) - F.length(F.regexp_replace(clean, r"\s", ""))
    return n_sym, n_ws


def _bpe_rep_duck(text_expr: str) -> str:
    """DuckDB twin of the wrapped-encoding + merge-chain pipeline."""
    rep = (
        f"regexp_replace(regexp_replace({text_expr}, "
        "'[' || chr(2) || chr(3) || ']', '', 'g'), "
        r"'([\s\S])', chr(2) || '\1' || chr(3), 'g')"
    )
    for a, b in BPE_MERGES:
        pat = f"chr(2) || '{a}' || chr(3) || chr(2) || '{b}' || chr(3)"
        rpl = f"chr(2) || '{a}{b}' || chr(3)"
        rep = f"replace({rep}, {pat}, {rpl})"
    return rep


def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, the BPE-ish regex
    pre-tokenizer, and REAL learned-merge BPE piece counts (the budget
    signal training pipelines actually use). chars_per_bpe_token is
    the compression-ratio quality signal, off the real piece count."""
    docs = with_tokens(load(spark, sf_dir, "documents"))
    pre = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
    n_pre = F.size(
        F.filter(pre, lambda t: ~t.rlike(r"^\s+$"))  # drop pure-space runs
    )
    n_sym, n_ws = _bpe_pieces(F.col("text"))
    n_bpe = n_sym - n_ws
    return docs.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_ws_tokens"),
        n_pre.cast("bigint").alias("n_pre_tokens"),
        n_bpe.cast("bigint").alias("n_bpe_tokens"),
        F.round(F.length("text") / n_bpe, 4).alias("chars_per_bpe_token"),
    )


#: bounded output for the corpus encode roll-up
BPE_VOCAB_TOP = 50


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide BPE ENCODE (the capability queued since round 7):
    apply the learned merge table to every document and roll the
    emitted pieces into the piece-frequency vocabulary — (piece,
    n_occ, n_docs), top-{BPE_VOCAB_TOP} by occurrence with a
    deterministic piece tiebreak. The greedy-leftmost merge semantics
    ride the SAME wrapped-symbol replace chain the count path proved
    (symbols can only match whole, adjacent matches share no chars),
    so the DuckDB twin is a literal replace-for-replace mirror — a
    full value gate, not rows-only.

    Scale shape: the explode fans out to ~chars rows, but the
    per-(doc, piece) pre-aggregate collapses map-side before the one
    piece-keyed shuffle, whose key space is the VOCABULARY (bounded
    by |merges| + |alphabet|), not the corpus. Whitespace pieces are
    dropped (they're segmentation fences, not vocabulary)."""
    docs = load(spark, sf_dir, "documents")
    rep = _bpe_rep(F.col("text"))
    # "\x02a\x03\x02b\x03" → strip outer wrappers → split on "\x03\x02"
    pieces = F.split(
        F.expr("substring(_rep, 2, length(_rep) - 2)"), _R + _L
    )
    per_doc = (
        docs.withColumn("_rep", rep)
        .select("doc_id", F.explode(pieces).alias("piece"))
        .filter((F.col("piece") != "") & ~F.col("piece").rlike(r"^\s+$"))
        .groupBy("doc_id", "piece")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        per_doc.groupBy("piece")
        .agg(
            F.sum("_c").alias("n_occ"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy(F.desc("n_occ"), "piece")
        .limit(BPE_VOCAB_TOP)
    )


#: chunk planning: window size / stride in whitespace tokens (the
#: overlap is CHUNK_TOKENS - CHUNK_STRIDE)
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def text_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-prep chunk PLANNING: per document, how many
    {CHUNK_TOKENS}-token windows at stride {CHUNK_STRIDE} cover it,
    and the tail-chunk size — all in closed-form integer arithmetic
    (`1 + ceil_div(n_tok - CHUNK, STRIDE)` when the doc overflows
    one window), WITHOUT materializing a single chunk row. The
    actual chunk explosion is a write-time fan-out (each row =
    tokens[start : start+CHUNK]); planning first is what a 100-TB
    corpus needs — the plan is doc-sized, the explosion is
    token-sized, and budgeting (how many embedding calls, how much
    write volume) reads off the plan. The `total_chunk_tokens`
    column is exactly the written volume the overlap implies."""
    docs = load(spark, sf_dir, "documents")
    plan = docs.select(
        "doc_id",
        # bigint: DuckDB len() is BIGINT and the gate is type-sensitive
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
    ).withColumn(
        "n_chunks",
        F.when(F.col("n_tokens") <= CHUNK_TOKENS, F.lit(1)).otherwise(
            F.lit(1)
            + F.expr(
                f"CAST((n_tokens - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)"
                f" div {CHUNK_STRIDE} AS INT)"
            )
        ).cast("int"),
    )
    last_start = (F.col("n_chunks") - 1) * CHUNK_STRIDE
    last_len = F.least(
        F.lit(CHUNK_TOKENS), F.col("n_tokens") - last_start
    )
    return plan.select(
        "doc_id",
        "n_tokens",
        "n_chunks",
        last_len.cast("int").alias("last_chunk_tokens"),
        (
            (F.col("n_chunks") - 1) * F.lit(CHUNK_TOKENS)
            + last_len
        ).cast("bigint").alias("total_chunk_tokens"),
    ).orderBy("doc_id")


QUERIES = {
    "text_stats": text_stats,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "text_bpe_tokens": text_bpe_tokens,
    "text_bpe_encode": text_bpe_encode,
    "text_chunk_plan": text_chunk_plan,
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
                   )) AS n_pre,
                   {_bpe_rep_duck("text")} AS rep
            FROM documents
        ),
        c AS (
            SELECT doc_id, text, n_pre,
                   (length(rep) - length(replace(rep, chr(2), '')))
                   - (length(regexp_replace(text,
                          '[' || chr(2) || chr(3) || ']', '', 'g'))
                      - length(regexp_replace(regexp_replace(text,
                          '[' || chr(2) || chr(3) || ']', '', 'g'),
                          '\\s', '', 'g')))
                       AS n_bpe
            FROM t
        )
        SELECT doc_id,
               len({_TOKS}) AS n_ws_tokens,
               n_pre AS n_pre_tokens,
               n_bpe AS n_bpe_tokens,
               round(length(text) / n_bpe, 4) AS chars_per_bpe_token
        FROM c
    """,
    "text_bpe_encode": f"""
        WITH enc AS (
            SELECT doc_id, {_bpe_rep_duck("text")} AS rep
            FROM documents
        ),
        pc AS (
            SELECT doc_id,
                   unnest(string_split(
                       substring(rep, 2, length(rep) - 2),
                       chr(3) || chr(2))) AS piece
            FROM enc
        ),
        per_doc AS (
            SELECT doc_id, piece, count(*) AS c
            FROM pc
            WHERE piece <> '' AND NOT regexp_matches(piece, '^\\s+$')
            GROUP BY doc_id, piece
        )
        SELECT piece,
               CAST(sum(c) AS BIGINT) AS n_occ,
               count(*) AS n_docs
        FROM per_doc
        GROUP BY piece
        ORDER BY n_occ DESC, piece
        LIMIT {BPE_VOCAB_TOP}
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

ORACLES["text_chunk_plan"] = f"""
    WITH t AS (
        SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents
    ),
    p AS (
        SELECT doc_id, n_tokens,
               CAST(CASE WHEN n_tokens <= {CHUNK_TOKENS} THEN 1
                    ELSE 1 + (n_tokens - {CHUNK_TOKENS}
                              + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}
               END AS INT) AS n_chunks
        FROM t
    )
    SELECT doc_id, n_tokens, n_chunks,
           CAST(least({CHUNK_TOKENS},
                      n_tokens - (n_chunks - 1) * {CHUNK_STRIDE})
                AS INT) AS last_chunk_tokens,
           CAST((n_chunks - 1) * {CHUNK_TOKENS}
                + least({CHUNK_TOKENS},
                        n_tokens - (n_chunks - 1) * {CHUNK_STRIDE})
                AS BIGINT) AS total_chunk_tokens
    FROM p
    ORDER BY doc_id
"""


# -------------------------------------------- readability (FORCAST)

#: vowel-group run — the standard syllable-count heuristic ('y' as a
#: vowel); one [aeiouy]+ match = one spoken syllable
_SYL_RE = "[aeiouy]+"


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source readability profile via the FORCAST grade — the one
    standard readability formula that needs NO sentence boundaries
    (designed for forms/technical prose; this corpus has zero
    sentence punctuation, so Flesch/SMOG are degenerate here by
    construction): grade = 20 - 15 * monosyllabic_words / words.
    Syllables are vowel-group runs ([aeiouy]+), the classic heuristic.

    Per source: document/word/syllable totals, syllables-per-word,
    the share of complex (>=3-syllable) words, and the FORCAST grade
    computed over the SOURCE-level integer totals — exact rational
    arithmetic, no mean-of-per-doc-ratios drift. Every count is an
    exact integer (partition-order invariant); the three displays are
    half-up ratios of those integers (`functions/exact`).

    Scale shape: one narrow projection computes the per-doc integer
    counts inside whole-stage codegen (regexp over the token array —
    no explode, no UDF), then ONE map-side-combinable groupBy(source)
    collapses to the |sources|-row report.
    """
    from ..functions.exact import halfup_ratio_sql, halfup_signed_ratio_sql

    docs = with_tokens(load(spark, sf_dir, "documents"))
    syl = f"size(regexp_extract_all(lower(t), '{_SYL_RE}', 0))"
    per_doc = docs.selectExpr(
        "source",
        "CAST(size(toks) AS BIGINT) AS w",
        f"aggregate(transform(toks, t -> {syl}),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS y",
        f"CAST(size(filter(toks, t -> {syl} = 1)) AS BIGINT) AS mono",
        f"CAST(size(filter(toks, t -> {syl} >= 3)) AS BIGINT) AS poly",
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("n_words"),
        F.sum("y").alias("n_syllables"),
        F.sum("mono").alias("n_mono"),
        F.sum("poly").alias("n_complex"),
    )
    return agg.selectExpr(
        "source",
        "n_docs",
        "n_words",
        "n_syllables",
        f"{halfup_ratio_sql('n_syllables', 'n_words', 4, 'spark')}"
        " AS syll_per_word",
        f"{halfup_ratio_sql('100 * n_complex', 'n_words', 2, 'spark')}"
        " AS complex_pct",
        f"{halfup_signed_ratio_sql('20000 * n_words - 15000 * n_mono', 'n_words', 0, 'spark')}"
        " / CAST(1000 AS DOUBLE) AS forcast_grade",
    ).orderBy("source")


QUERIES["text_readability"] = text_readability


def _readability_oracle() -> str:
    from ..functions.exact import halfup_ratio_sql, halfup_signed_ratio_sql

    syl = f"len(regexp_extract_all(lower(__T__), '{_SYL_RE}'))"
    return f"""
        WITH per_doc AS (
            SELECT source,
                   CAST(len(toks) AS BIGINT) AS w,
                   CAST(list_sum(list_transform(toks,
                        t -> {syl.replace('__T__', 't')})) AS BIGINT) AS y,
                   CAST(len(list_filter(toks,
                        t -> {syl.replace('__T__', 't')} = 1))
                        AS BIGINT) AS mono,
                   CAST(len(list_filter(toks,
                        t -> {syl.replace('__T__', 't')} >= 3))
                        AS BIGINT) AS poly
            FROM (SELECT source, {_TOKS} AS toks FROM documents)
        ),
        agg AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(w) AS BIGINT) AS n_words,
                   CAST(sum(y) AS BIGINT) AS n_syllables,
                   CAST(sum(mono) AS BIGINT) AS n_mono,
                   CAST(sum(poly) AS BIGINT) AS n_complex
            FROM per_doc GROUP BY source
        )
        SELECT source, n_docs, n_words, n_syllables,
               {halfup_ratio_sql('n_syllables', 'n_words', 4, 'duck')}
                   AS syll_per_word,
               {halfup_ratio_sql('100 * n_complex', 'n_words', 2, 'duck')}
                   AS complex_pct,
               {halfup_signed_ratio_sql('20000 * n_words - 15000 * n_mono', 'n_words', 0, 'duck')}
                   / CAST(1000 AS DOUBLE) AS forcast_grade
        FROM agg
        ORDER BY source
    """


ORACLES["text_readability"] = _readability_oracle()
