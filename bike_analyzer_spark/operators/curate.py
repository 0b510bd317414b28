"""End-to-end corpus curation — the composed LLM-data-pipeline
flagship: quality gate → language gate → exact-dedup keep-list →
train/test split, all in ONE declarative plan.

This is the query a training-data team actually runs: every stage is
an operator that also exists standalone (text_stats quality algebra,
text_langid prediction, dedup_exact's md5 keep-list, sampling's hash
split), composed here so Catalyst sees the WHOLE pipeline at once —
filters push into the scan, the projections fuse into one codegen
stage, and the only shuffle in the entire plan is the dedup
keep-list's window over md5(text). At 100 TB that means: one pass
over the corpus, one exchange, no driver round-trips between stages.

Gates (deliberately mirror the standalone operators' arithmetic):
- quality_score >= QUALITY_MIN   (length-and-stopword heuristic)
- lang_pred != 'und'             (marker-token language ID)
- exact-dup keep: min doc_id per md5(text) among gate survivors
  (dedup AFTER filtering — the standard order, so a low-quality
  duplicate can't shadow a high-quality original)
- split: portable-hash 80/20 (stable under subsetting)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import hash64, hash64_duck, tokens
from ..sources.catalog import load
from .sampling import TRAIN_PCT, _SPLIT_SALT
from .text import LANG_MARKERS, STOPWORDS, _sql_list, _TOKS

QUALITY_MIN = 0.5


def curate_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated corpus: surviving doc_ids with their language,
    quality score, and split assignment."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "toks", tokens("text")
    )
    n_tok = F.size("toks")
    stop_ratio = (
        F.size(F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS))) / n_tok
    )
    quality = F.round(
        F.least(F.lit(1.0), n_tok / F.lit(50.0)) * (F.lit(1.0) - stop_ratio),
        4,
    )
    hits = {
        code: F.size(F.filter(F.col("toks"), lambda t: t.isin(*markers)))
        for code, markers in LANG_MARKERS.items()
    }
    lang_pred = (
        F.when((hits["en"] >= 2) & (hits["en"] >= hits["pt"]), F.lit("en"))
        .when(hits["pt"] >= 2, F.lit("pt"))
        .otherwise(F.lit("und"))
    )
    gated = (
        docs.select(
            "doc_id",
            "text",
            quality.alias("quality_score"),
            lang_pred.alias("lang_pred"),
        )
        .filter(
            (F.col("quality_score") >= QUALITY_MIN)
            & (F.col("lang_pred") != "und")
        )
    )
    # exact-dedup keep-list among survivors: min doc_id per content hash
    w = Window.partitionBy(F.md5(F.encode("text", "UTF-8"))).orderBy("doc_id")
    kept = (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "text")
    )
    bucket = hash64(F.col("doc_id").cast("string"), _SPLIT_SALT) % 100
    return kept.select(
        "doc_id",
        "lang_pred",
        "quality_score",
        F.when(bucket < TRAIN_PCT, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    ).orderBy("doc_id")


QUERIES = {"curate_keep_list": curate_keep_list}

ORACLES = {
    "curate_keep_list": f"""
        WITH t AS (
            SELECT doc_id, text, {_TOKS} AS toks FROM documents
        ),
        scored AS (
            SELECT doc_id, text,
                   round(least(1.0, len(toks) / 50.0)
                       * (1.0 - len(list_filter(toks,
                           x -> x IN ({_sql_list(STOPWORDS)}))) / len(toks)),
                       4) AS quality_score,
                   len(list_filter(toks,
                       x -> x IN ({_sql_list(LANG_MARKERS["en"])}))) AS en_hits,
                   len(list_filter(toks,
                       x -> x IN ({_sql_list(LANG_MARKERS["pt"])}))) AS pt_hits
            FROM t
        ),
        gated AS (
            SELECT doc_id, text, quality_score,
                   CASE WHEN en_hits >= 2 AND en_hits >= pt_hits THEN 'en'
                        WHEN pt_hits >= 2 THEN 'pt'
                        ELSE 'und' END AS lang_pred
            FROM scored
            WHERE quality_score >= {QUALITY_MIN}
        ),
        kept AS (
            SELECT doc_id, lang_pred, quality_score,
                   row_number() OVER (
                       PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM gated
            WHERE lang_pred != 'und'
        )
        SELECT doc_id, lang_pred, quality_score,
               CASE WHEN {hash64_duck("CAST(doc_id AS VARCHAR)",
                                      repr(_SPLIT_SALT))} % 100 < {TRAIN_PCT}
                    THEN 'train' ELSE 'test' END AS split
        FROM kept
        WHERE rn = 1
        ORDER BY doc_id
    """,
}


def source_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source DATA CARD — the one-page curation summary a
    training-data team publishes alongside a corpus release: volume
    (docs / tokens / chars), exact-duplicate rate, Gopher/C4 quality
    pass rate, and language composition, one row per source.

    Every statistic reuses a standalone operator's arithmetic
    verbatim (`quality.rule_flags` for the keep gate, `text`'s
    marker langid, `dedup_exact`'s md5 identity), so the card is
    consistent-by-construction with the pipeline's own gates —
    a reader can drill from any card number into the operator that
    produced it.

    Exactness: every displayed rate is `halfup_ratio_sql` over
    exact integer (count, count) pairs — the card carries no
    rounded doubles at all.

    Scale shape: ONE corpus scan computing all per-doc columns in a
    single fused projection (tokenize subexpressions share via
    codegen CSE), then one hash aggregate keyed by source. The
    exact-duplicate count rides count(DISTINCT md5) INSIDE the same
    aggregate — Spark plans the standard two-phase distinct-agg
    expansion, so per-reducer state is (source, hash)-sized, the
    same bound dedup_exact already carries. No joins anywhere.
    """
    from ..functions.exact import halfup_ratio_sql
    from .quality import rule_flags

    flagged = rule_flags(load(spark, sf_dir, "documents"))
    toks = tokens("text")
    hits = {
        code: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for code, markers in LANG_MARKERS.items()
    }
    pred = (
        F.when(
            (hits["en"] >= 2) & (hits["en"] >= hits["pt"]), F.lit("en")
        )
        .when(hits["pt"] >= 2, F.lit("pt"))
        .otherwise(F.lit("und"))
    )
    per_doc = flagged.select(
        "source",
        F.size(toks).cast("long").alias("ntok"),
        "n_chars",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("h"),
        F.col("keep").cast("long").alias("keepi"),
        (pred == "en").cast("long").alias("eni"),
        (pred == "und").cast("long").alias("undi"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("n_tokens"),
        F.sum("n_chars").alias("sum_chars"),
        F.count_distinct(F.col("h")).alias("n_uniq"),
        F.sum("keepi").alias("n_keep"),
        F.sum("eni").alias("n_en"),
        F.sum("undi").alias("n_und"),
    )
    return agg.selectExpr(
        "source",
        "n_docs",
        "n_tokens",
        "sum_chars",
        f"{halfup_ratio_sql('n_tokens', 'n_docs', 2)} AS mean_tokens",
        f"{halfup_ratio_sql('100 * (n_docs - n_uniq)', 'n_docs', 4)}"
        " AS exact_dup_pct",
        f"{halfup_ratio_sql('100 * n_keep', 'n_docs', 4)} AS keep_pct",
        f"{halfup_ratio_sql('100 * n_en', 'n_docs', 4)} AS en_pct",
        f"{halfup_ratio_sql('100 * n_und', 'n_docs', 4)} AS und_pct",
    ).orderBy("source")


QUERIES["source_data_card"] = source_data_card


def _data_card_oracle() -> str:
    from ..functions.exact import halfup_ratio_sql
    from .quality import KEEP_EXPR, _max_token_count_duck

    def pct(num: str) -> str:
        return halfup_ratio_sql(num, "n_docs", 4, engine="duck")

    return f"""
        WITH t AS (
            SELECT source, text, n_chars, {_TOKS} AS toks
            FROM documents
        ),
        m AS (
            SELECT source, text, n_chars,
                   len(toks) AS n_tok,
                   length(regexp_replace(text, '\\s', '', 'g'))
                       / len(toks) AS mean_len,
                   length(regexp_replace(text, '[a-z0-9\\s]', '', 'g'))
                       / length(text) AS sym_ratio,
                   len(list_filter(toks,
                       x -> x IN ({_sql_list(STOPWORDS)}))) AS stop_hits,
                   {_max_token_count_duck("toks")} / len(toks)
                       AS top_ratio,
                   len(list_filter(toks, x -> x IN
                       ({_sql_list(LANG_MARKERS["en"])}))) AS en_hits,
                   len(list_filter(toks, x -> x IN
                       ({_sql_list(LANG_MARKERS["pt"])}))) AS pt_hits
            FROM t
        ),
        f AS (
            SELECT source, n_chars,
                   CAST(n_tok AS BIGINT) AS ntok,
                   md5(text) AS h,
                   CASE WHEN {KEEP_EXPR} THEN 1 ELSE 0 END AS keepi,
                   CASE WHEN en_hits >= 2 AND en_hits >= pt_hits
                        THEN 'en'
                        WHEN pt_hits >= 2 THEN 'pt'
                        ELSE 'und' END AS pred
            FROM m
        ),
        agg AS (
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(ntok) AS BIGINT) AS n_tokens,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   count(DISTINCT h) AS n_uniq,
                   CAST(sum(keepi) AS BIGINT) AS n_keep,
                   CAST(sum(CASE WHEN pred = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_en,
                   CAST(sum(CASE WHEN pred = 'und' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_und
            FROM f GROUP BY source
        )
        SELECT source, n_docs, n_tokens, sum_chars,
               {halfup_ratio_sql('n_tokens', 'n_docs', 2, engine='duck')}
                   AS mean_tokens,
               {pct('100 * (n_docs - n_uniq)')} AS exact_dup_pct,
               {pct('100 * n_keep')} AS keep_pct,
               {pct('100 * n_en')} AS en_pct,
               {pct('100 * n_und')} AS und_pct
        FROM agg
        ORDER BY source
    """


ORACLES["source_data_card"] = _data_card_oracle()


def corpus_build_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end CORPUS BUILD card — the per-stage funnel of
    `pipeline.run_corpus_build` (scrub → quality gates → exact dedup
    keep-first → train/val split) as one deterministic, oracle-gated
    driver query: stage, rows in, rows out, and the docs each stage
    touched. The pipeline itself reads its audit numbers from
    observed metrics inside the shard write (pipeline.py:94-110);
    this query recomputes the SAME funnel declaratively so the
    driver's DuckDB gate covers the composed stage arithmetic, not
    just each stage in isolation.

    Stage semantics mirror pipeline.curated_docs exactly: the
    quality gates run over the SCRUBBED text, dedup keeps the
    smallest doc_id per md5(clean_text) among gate survivors, the
    split hashes the keeper's doc_id with the pipeline salt.

    Scale shape: ONE corpus scan (scrub + gates fuse into the scan
    projection), one hash aggregate on the text digest (the same
    exchange the dedup stage itself pays), then a 1-row global
    aggregate unpivoted via stack() — no driver materialization, no
    second corpus pass."""
    from ..pipeline import TRAIN_PCT as _PIPE_PCT
    from ..pipeline import _SPLIT_SALT as _PIPE_SALT
    from .quality import rule_flags
    from .scrub import scrub_flags

    docs = load(spark, sf_dir, "documents")
    scrubbed = (
        scrub_flags(docs)
        .withColumn(
            "pii",
            (
                F.col("n_urls") + F.col("n_emails") + F.col("n_phones")
                > 0
            ).cast("long"),
        )
        .drop("text")
        .withColumnRenamed("clean_text", "text")
    )
    flagged = rule_flags(scrubbed).select(
        "doc_id",
        "pii",
        F.col("keep").cast("long").alias("keepi"),
        F.md5(F.encode("text", "UTF-8")).alias("h"),
    )
    # one exchange: group by content hash (keep is a pure function of
    # the text, so it is constant within a group)
    groups = flagged.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_grp"),
        F.sum("pii").alias("n_pii_grp"),
        F.sum("keepi").alias("n_keep_grp"),
        F.min(F.when(F.col("keepi") == 1, F.col("doc_id"))).alias(
            "keeper"
        ),
    )
    train_flag = (
        hash64(F.col("keeper").cast("string"), _PIPE_SALT) % 100
        < _PIPE_PCT
    )
    agg = groups.agg(
        F.sum("n_grp").alias("n_raw"),
        F.sum("n_pii_grp").alias("n_pii"),
        F.sum("n_keep_grp").alias("n_gated"),
        F.count("keeper").alias("n_dedup"),
        F.sum(F.when(train_flag, 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
    )
    return agg.selectExpr(
        """stack(5,
            '1_scrub_pii',    n_raw,   n_raw,             n_pii,
            '2_quality_gate', n_raw,   n_gated,           n_raw - n_gated,
            '3_exact_dedup',  n_gated, n_dedup,           n_gated - n_dedup,
            '4_split_train',  n_dedup, n_train,           n_train,
            '5_split_val',    n_dedup, n_dedup - n_train, n_dedup - n_train
        ) AS (stage, rows_in, rows_out, docs_affected)"""
    ).orderBy("stage")


QUERIES["corpus_build_card"] = corpus_build_card


def _build_card_oracle() -> str:
    from ..pipeline import TRAIN_PCT as _PIPE_PCT
    from ..pipeline import _SPLIT_SALT as _PIPE_SALT
    from .quality import KEEP_EXPR, _max_token_count_duck
    from .scrub import (
        EMAIL_RE,
        EMAIL_TOKEN,
        PHONE_RE,
        PHONE_TOKEN,
        URL_RE,
        URL_TOKEN,
    )

    return f"""
        WITH s AS (
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(
                       text, '{URL_RE}', '{URL_TOKEN}', 'g'),
                             '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g'),
                             '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS text,
                   CASE WHEN len(regexp_extract_all(text, '{URL_RE}'))
                           + len(regexp_extract_all(text, '{EMAIL_RE}'))
                           + len(regexp_extract_all(text, '{PHONE_RE}'))
                           > 0 THEN 1 ELSE 0 END AS pii
            FROM documents
        ),
        t AS (
            SELECT doc_id, pii, text, {_TOKS} AS toks FROM s
        ),
        m AS (
            SELECT doc_id, pii, text,
                   len(toks) AS n_tok,
                   length(regexp_replace(text, '\\s', '', 'g'))
                       / len(toks) AS mean_len,
                   length(regexp_replace(text, '[a-z0-9\\s]', '', 'g'))
                       / length(text) AS sym_ratio,
                   len(list_filter(toks,
                       x -> x IN ({_sql_list(STOPWORDS)}))) AS stop_hits,
                   {_max_token_count_duck("toks")} / len(toks)
                       AS top_ratio
            FROM t
        ),
        f AS (
            SELECT doc_id, pii, md5(text) AS h,
                   CASE WHEN {KEEP_EXPR} THEN 1 ELSE 0 END AS keepi
            FROM m
        ),
        g AS (
            SELECT h, count(*) AS n_grp, sum(pii) AS n_pii_grp,
                   sum(keepi) AS n_keep_grp,
                   min(CASE WHEN keepi = 1 THEN doc_id END) AS keeper
            FROM f GROUP BY h
        ),
        a AS (
            SELECT CAST(sum(n_grp) AS BIGINT) AS n_raw,
                   CAST(sum(n_pii_grp) AS BIGINT) AS n_pii,
                   CAST(sum(n_keep_grp) AS BIGINT) AS n_gated,
                   CAST(count(keeper) AS BIGINT) AS n_dedup,
                   CAST(sum(CASE WHEN
                       {hash64_duck("CAST(keeper AS VARCHAR)",
                                    repr(_PIPE_SALT))} % 100 < {_PIPE_PCT}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_train
            FROM g
        )
        SELECT '1_scrub_pii' AS stage, n_raw AS rows_in,
               n_raw AS rows_out, n_pii AS docs_affected FROM a
        UNION ALL SELECT '2_quality_gate', n_raw, n_gated,
               n_raw - n_gated FROM a
        UNION ALL SELECT '3_exact_dedup', n_gated, n_dedup,
               n_gated - n_dedup FROM a
        UNION ALL SELECT '4_split_train', n_dedup, n_train,
               n_train FROM a
        UNION ALL SELECT '5_split_val', n_dedup, n_dedup - n_train,
               n_dedup - n_train FROM a
        ORDER BY stage
    """


ORACLES["corpus_build_card"] = _build_card_oracle()
