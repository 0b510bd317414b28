"""Function-surface suites, wave 2 — higher-order ARRAY functions,
the DATETIME derivation family, and the rank/dense_rank tie
semantics, each as one oracle-gated query.

`kpi.f_scalar_suite` / `f_json_*` / `f_haversine_suite` cover the
reference's scalar surface (SURVEY §2.6); these three extend the
surface to the function families a warehouse user reaches for next,
picking ONLY forms whose semantics the two engines share exactly
(each divergence class is documented inline — e.g. Spark's
`dayofweek` is 1=Sunday while DuckDB's is 0=Sunday, so the suite
derives ISO day numbers via `weekday()+1` ≡ `isodow`).

All three are narrow projections or bounded aggregates: the array
suite is per-document column algebra inside codegen (no UDFs, no
explode); the datetime suite collapses the events corpus to a
(quarter × iso-dow) grid; the rank suite to one row per event type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import floordiv_duck, floordiv_sql
from ..functions.textfns import tokens
from ..sources.catalog import load

#: probe words for the membership/position forms
ARRAY_PROBES = ("the", "of")
#: value-bucket width (milli-units) that manufactures rank ties
RANK_BUCKET_M = 1000

#: floor-division value bucket for the DuckDB oracle (twin of the
#: Spark side's floordiv_sql — value CAN be negative in general)
_VB_FLOOR = floordiv_duck("CAST(round(value * 1000) AS BIGINT)", RANK_BUCKET_M)


def f_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order and set-wise array functions over each document's
    token array: distinctness, sorted slicing, membership overlap,
    position probing, a `forall` predicate, and an `aggregate` fold —
    every form JVM-side, no explode (the array never leaves the row).
    DuckDB twins are the list_* family; `array_position` and
    `list_position` agree on 0-when-absent, which is why the probe
    word result needs no null handling."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "toks", tokens("text")
    )
    probes = F.array(*[F.lit(w) for w in ARRAY_PROBES])
    max_len = F.aggregate(
        F.col("toks"),
        F.lit(0),
        lambda acc, x: F.greatest(acc, F.length(x)),
    )
    return docs.select(
        "doc_id",
        F.size(F.array_distinct("toks")).cast("bigint").alias(
            "n_distinct_tokens"
        ),
        F.array_join(
            F.slice(F.sort_array("toks"), 1, 3), ","
        ).alias("first3_sorted"),
        F.arrays_overlap(F.col("toks"), probes).alias("has_probe"),
        F.array_position(F.col("toks"), ARRAY_PROBES[0])
        .cast("bigint")
        .alias("probe_pos"),
        F.forall(F.col("toks"), lambda x: F.length(x) > 0).alias(
            "all_nonempty"
        ),
        max_len.cast("bigint").alias("max_token_len"),
    ).orderBy("doc_id")


def f_datetime_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datetime derivation family over events, collapsed to the
    (quarter × ISO-day-of-week) grid: week truncation, ISO week
    numbers, month-end clamping, and day counting — the forms whose
    cross-engine semantics are exact. ISO day = Spark `weekday()+1`
    ≡ DuckDB `isodow` (the engines' bare `dayofweek` disagree on the
    week start); `date_trunc('week')` starts Monday in both;
    `last_day` clamps to month end in both."""
    ev = load(spark, sf_dir, "events").select(
        F.quarter("ts").cast("int").alias("quarter"),
        (F.weekday("ts") + 1).cast("int").alias("dow_iso"),
        F.to_date(F.date_trunc("week", F.col("ts"))).alias("week_start"),
        F.weekofyear("ts").cast("int").alias("iso_week"),
        F.to_date("ts").alias("d"),
        F.last_day(F.to_date("ts")).alias("month_end"),
    )
    return (
        ev.groupBy("quarter", "dow_iso")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("d").alias("n_days"),
            F.min("week_start").alias("first_week_start"),
            F.min("iso_week").alias("min_iso_week"),
            F.max("iso_week").alias("max_iso_week"),
            F.max("month_end").alias("last_month_end"),
        )
        .orderBy("quarter", "dow_iso")
    )


def f_rank_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank vs row_number under REAL ties (values
    bucketed to {RANK_BUCKET_M} milli-units): per event type, the
    maximum of each ranking plus the distinct-bucket count. The
    defining identities — max(row_number) = n rows, max(dense_rank)
    = n distinct buckets, max(rank) ≤ n rows with gaps exactly where
    ties are — make the output self-checking, and both engines
    implement the standard semantics."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr(
            floordiv_sql("CAST(round(value * 1000) AS BIGINT)", RANK_BUCKET_M)
        ).alias("v_bucket"),
    )
    w = Window.partitionBy("event_type").orderBy("v_bucket")
    ranked = (
        ev.withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    "v_bucket", "event_id"
                )
            ),
        )
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # bigint: Spark's ranking fns are int, DuckDB's BIGINT
            F.max("rn").cast("bigint").alias("max_row_number"),
            F.max("rnk").cast("bigint").alias("max_rank"),
            F.max("drnk").cast("bigint").alias("max_dense_rank"),
            F.count_distinct("v_bucket").alias("n_buckets"),
        )
        .orderBy("event_type")
    )


def f_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-manipulation family over documents (pure ASCII by
    data contract, so no locale/collation divergence class exists):
    casing, slicing, searching, masking, edit distance, and hashing
    — one narrow codegen projection per document. Cross-engine
    pairings chosen for shared semantics: `substring_index` ≡
    `split_part` (whole string when the delimiter is absent),
    `instr` ≡ `strpos` (1-based, 0 when absent), and DuckDB's
    `regexp_replace` needs the explicit 'g' flag to match Spark's
    replace-all default."""
    docs = load(spark, sf_dir, "documents")
    first_word = F.substring_index("text", " ", 1)
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
        .cast("bigint")
        .alias("n_alpha"),
        first_word.alias("first_word"),
        F.upper(F.substring("text", 1, 8)).alias("head_upper"),
        F.instr(F.lower("text"), " the ").cast("bigint").alias("pos_the"),
        F.levenshtein(first_word, F.lit("the"))
        .cast("bigint")
        .alias("lev_the"),
        F.translate(
            F.substring(F.reverse("text"), 1, 12), "aeiou", "#####"
        ).alias("rev_head_masked"),
        F.md5("text").alias("text_md5"),
    ).orderBy("doc_id")


QUERIES = {
    "f_array_ops": f_array_ops,
    "f_datetime_ops": f_datetime_ops,
    "f_rank_ties": f_rank_ties,
    "f_string_ops": f_string_ops,
}

_TOKS = "string_split_regex(trim(text), '\\s+')"
_PROBES = "[" + ", ".join(f"'{w}'" for w in ARRAY_PROBES) + "]"

ORACLES = {
    "f_array_ops": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
        SELECT doc_id,
               len(list_distinct(toks)) AS n_distinct_tokens,
               array_to_string(list_sort(toks)[1:3], ',')
                   AS first3_sorted,
               list_has_any(toks, {_PROBES}) AS has_probe,
               CAST(list_position(toks, '{ARRAY_PROBES[0]}') AS BIGINT)
                   AS probe_pos,
               len(list_filter(toks, x -> len(x) = 0)) = 0
                   AS all_nonempty,
               CAST(list_max(list_transform(toks, x -> len(x)))
                    AS BIGINT) AS max_token_len
        FROM t
        ORDER BY doc_id
    """,
    "f_datetime_ops": """
        WITH e AS (
            SELECT CAST(quarter(ts) AS INT) AS quarter,
                   CAST(isodow(ts) AS INT) AS dow_iso,
                   CAST(date_trunc('week', ts) AS DATE) AS week_start,
                   CAST(weekofyear(ts) AS INT) AS iso_week,
                   CAST(ts AS DATE) AS d,
                   last_day(CAST(ts AS DATE)) AS month_end
            FROM events
        )
        SELECT quarter, dow_iso,
               count(*) AS n_events,
               count(DISTINCT d) AS n_days,
               min(week_start) AS first_week_start,
               min(iso_week) AS min_iso_week,
               max(iso_week) AS max_iso_week,
               max(month_end) AS last_month_end
        FROM e
        GROUP BY quarter, dow_iso
        ORDER BY quarter, dow_iso
    """,
    "f_string_ops": """
        WITH t AS (
            SELECT doc_id, text,
                   split_part(text, ' ', 1) AS first_word
            FROM documents
        )
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    AS BIGINT) AS n_alpha,
               first_word,
               upper(substr(text, 1, 8)) AS head_upper,
               CAST(strpos(lower(text), ' the ') AS BIGINT) AS pos_the,
               CAST(levenshtein(first_word, 'the') AS BIGINT) AS lev_the,
               translate(substr(reverse(text), 1, 12), 'aeiou', '#####')
                   AS rev_head_masked,
               md5(text) AS text_md5
        FROM t
        ORDER BY doc_id
    """,
    "f_rank_ties": f"""
        WITH e AS (
            SELECT event_type, event_id,
                   {_VB_FLOOR} AS v_bucket
            FROM events
        ),
        r AS (
            SELECT event_type, v_bucket,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY v_bucket, event_id) AS rn
            FROM e
            WINDOW w AS (PARTITION BY event_type ORDER BY v_bucket)
        )
        SELECT event_type,
               count(*) AS n_rows,
               CAST(max(rn) AS BIGINT) AS max_row_number,
               CAST(max(rnk) AS BIGINT) AS max_rank,
               CAST(max(drnk) AS BIGINT) AS max_dense_rank,
               count(DISTINCT v_bucket) AS n_buckets
        FROM r
        GROUP BY event_type
        ORDER BY event_type
    """,
}


#: probe key for the map-extraction forms
MAP_PROBE = "table"


def f_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAP-type function family over each document's token-count
    map (token -> occurrences): construction (map_from_entries over
    a distinct-key entry array), cardinality, safe extraction
    (try_element_at — ANSI-strict-safe where element_at throws on a
    missing key), predicate filtering (map_filter), value projection
    (map_values + aggregate fold), and containment (map_contains_key).
    The map never leaves the row — one codegen projection, no explode,
    no shuffle before the final doc_id sort.

    The DuckDB twin computes the SAME integers from the token list
    directly (list_distinct/list_filter): the oracle gates the
    RESULTS; the map surface under test is Spark's. Per-row cost is
    O(distinct x tokens) membership counting — bounded by the
    document token count, the same contract as f_array_ops' fold."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "toks", tokens("text")
    )
    tc = (
        "map_from_entries(transform(array_distinct(toks),"
        " t -> struct(t AS key, CAST(size(filter(toks, x -> x = t))"
        " AS BIGINT) AS value)))"
    )
    return docs.selectExpr("doc_id", f"{tc} AS tc").selectExpr(
        "doc_id",
        "CAST(cardinality(tc) AS BIGINT) AS n_distinct_tokens",
        f"coalesce(try_element_at(tc, '{MAP_PROBE}'), CAST(0 AS BIGINT))"
        " AS probe_count",
        f"map_contains_key(tc, '{MAP_PROBE}') AS has_probe",
        "CAST(cardinality(map_filter(tc, (k, v) -> v >= 2))"
        " AS BIGINT) AS n_repeated",
        "CAST(array_max(map_values(tc)) AS BIGINT) AS max_count",
        "aggregate(map_values(tc), CAST(0 AS BIGINT),"
        " (acc, x) -> acc + x) AS n_tokens",
    ).orderBy("doc_id")


QUERIES["f_map_ops"] = f_map_ops

ORACLES["f_map_ops"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    c AS (
        SELECT doc_id, toks, list_distinct(toks) AS dt FROM t
    )
    SELECT doc_id,
           CAST(len(dt) AS BIGINT) AS n_distinct_tokens,
           CAST(len(list_filter(toks, x -> x = '{MAP_PROBE}'))
                AS BIGINT) AS probe_count,
           list_contains(toks, '{MAP_PROBE}') AS has_probe,
           CAST(len(list_filter(dt,
                t -> len(list_filter(toks, x -> x = t)) >= 2))
                AS BIGINT) AS n_repeated,
           CAST(list_max(list_transform(dt,
                t -> len(list_filter(toks, x -> x = t))))
                AS BIGINT) AS max_count,
           CAST(len(toks) AS BIGINT) AS n_tokens
    FROM c
    ORDER BY doc_id
"""


def f_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STRUCT-type function family — the last cell of the
    type-function matrix (array/map/datetime/string suites already
    driver-gated): construction (struct / named_struct incl. a nested
    two-level struct), NESTED field access (profile.doc.n_tokens —
    the path Catalyst prunes to a scalar), struct-array ORDERING
    (array_sort over (count, token) structs — lexicographic by field
    position, the SQL-standard struct comparison), and field
    extraction from the sorted ends (arg-min / arg-max without a
    shuffle or a window).

    Everything is row-local — one codegen projection, the struct
    never leaves the row; the only shuffle is the final doc_id sort.
    The DuckDB twin computes the same integers relationally (explode
    + group + two rank windows): the oracle gates the RESULTS, the
    struct surface under test is Spark's. Per-row cost is
    O(distinct x tokens), the f_map_ops/f_array_ops contract."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "toks", tokens("text")
    )
    entries = (
        "transform(array_distinct(toks), t -> struct("
        "CAST(size(filter(toks, x -> x = t)) AS BIGINT) AS c, t AS tok))"
    )
    return (
        docs.selectExpr(
            "doc_id",
            f"array_sort({entries}) AS asc_e",
            f"array_sort(transform({entries},"
            " e -> struct(-e.c AS nc, e.tok AS tok))) AS desc_e",
            "named_struct('doc', named_struct("
            "'n_tokens', CAST(size(toks) AS BIGINT),"
            "'n_distinct', CAST(size(array_distinct(toks)) AS BIGINT)"
            ")) AS profile",
        )
        .selectExpr(
            "doc_id",
            "profile.doc.n_tokens AS n_tokens",
            "profile.doc.n_distinct AS n_distinct",
            "element_at(asc_e, 1).c AS rarest_count",
            "element_at(asc_e, 1).tok AS rarest_token",
            "-element_at(desc_e, 1).nc AS top_count",
            "element_at(desc_e, 1).tok AS top_token",
        )
        .orderBy("doc_id")
    )


QUERIES["f_struct_ops"] = f_struct_ops

ORACLES["f_struct_ops"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
        GROUP BY doc_id, tok
    ),
    r AS (
        SELECT doc_id, c, tok,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY c, tok) AS rn,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY c DESC, tok) AS rx
        FROM g
    )
    SELECT d.doc_id,
           d.n_tokens,
           nd.n_distinct,
           rmin.c AS rarest_count,
           rmin.tok AS rarest_token,
           rmax.c AS top_count,
           rmax.tok AS top_token
    FROM (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t) d
    JOIN (SELECT doc_id, count(*) AS n_distinct FROM g GROUP BY doc_id) nd
      USING (doc_id)
    JOIN (SELECT doc_id, c, tok FROM r WHERE rn = 1) rmin USING (doc_id)
    JOIN (SELECT doc_id, c, tok FROM r WHERE rx = 1) rmax USING (doc_id)
    ORDER BY doc_id
"""
