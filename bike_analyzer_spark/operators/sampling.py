"""Deterministic sampling & dataset splitting — the training-data
pipeline primitives a 100-TB corpus build runs between dedup and
training: reproducible train/test assignment and per-stratum
downsampling. Everything is HASH-deterministic (the portable md5
hash64 shared with the dedup pack) — no RNG, so reruns, retries and
the DuckDB oracles all agree bit-for-bit, and assignment is stable
under repartitioning/insertion order (the property `rand(seed)` does
NOT have: its draw depends on row position).

100-TB shapes:
- split: a narrow projection (hash + comparison per row) — zero
  shuffles, fully codegen'd; any table size.
- stratified sample: "keep the N smallest hashes per stratum" via a
  SALTED two-stage top-N — stage 1 takes the top-N within each
  (stratum, salt) slice, stage 2 re-ranks the <= SALTS*N survivors
  per stratum. A hot stratum therefore never concentrates more than
  its slice on one task; the salt changes nothing about the result
  (the N global minima survive every salting) but caps per-task
  state. Plan-asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import halfup_ratio_sql
from ..functions.textfns import hash64, hash64_duck
from ..sources.catalog import load

TRAIN_PCT = 80  # hash buckets 0-79 -> train, 80-99 -> test
_SPLIT_SALT = "split"
STRATA_N = 40  # sample size per stratum
_SAMPLE_SALT = "strat"
_STAGE_SALTS = 16


def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/test split of the documents table: bucket =
    hash64('split', doc_id) % 100; < TRAIN_PCT -> train. Adding or
    removing rows never flips any other row's assignment."""
    docs = load(spark, sf_dir, "documents")
    bucket = hash64(F.col("doc_id").cast("string"), _SPLIT_SALT) % 100
    return docs.select(
        "doc_id",
        F.when(bucket < TRAIN_PCT, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    ).orderBy("doc_id")


def split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split sizes + mean doc length per side — the sanity check a
    pipeline runs right after splitting (a skewed split is a bug)."""
    docs = load(spark, sf_dir, "documents")
    bucket = hash64(F.col("doc_id").cast("string"), _SPLIT_SALT) % 100
    return (
        docs.select(
            F.when(bucket < TRAIN_PCT, F.lit("train"))
            .otherwise(F.lit("test"))
            .alias("split"),
            F.length("text").alias("len"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("len").alias("_s"),
        )
        # integer mean via exact half-up (functions.exact)
        .selectExpr(
            "split", "n_docs",
            halfup_ratio_sql("_s", "n_docs") + " AS avg_len",
        )
        .orderBy("split")
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type sample: the STRATA_N events with the smallest
    hash64('strat', event_id) in each stratum — a deterministic
    reservoir. Two-stage salted top-N keeps a hot stratum from
    concentrating on one task; the final result is identical to the
    single-window form (the N global minima survive any salting),
    which the oracle computes directly."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type")
    hk = hash64(F.col("event_id").cast("string"), _SAMPLE_SALT)
    salted = ev.withColumn("hk", hk).withColumn(
        "salt", (F.col("event_id") % _STAGE_SALTS).cast("int")
    )
    w1 = Window.partitionBy("event_type", "salt").orderBy("hk", "event_id")
    survivors = (
        salted.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= STRATA_N)
        .drop("rn", "salt")
    )
    w2 = Window.partitionBy("event_type").orderBy("hk", "event_id")
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= STRATA_N)
        .select("event_type", "event_id", F.col("rn").cast("bigint").alias("rn"))
        .orderBy("event_type", "rn")
    )


WEIGHTED_N = 100  # weighted-sample size
_WS_SALT = "ws"
_U_DEN = 1 << 32  # hash64 word range: u = (h+1)/2^32 in (0, 1]
_LN_QUANT = 1_000_000  # micro-nat quantization (dsir pattern)


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each doc draws u from its md5 hash
    ((h+1)/2^32 ∈ (0,1]) and the WEIGHTED_N largest keys u^(1/w)
    win, with w = n_chars — long docs proportionally likelier, any
    single doc includable at most once, and the draw reproducible
    under repartitioning and reruns (no RNG anywhere).

    Cross-engine exactness: ranking by u^(1/w) equals ranking by
    ln(u)/w, so the ONE transcendental, ln(u), is quantized to
    integer micro-nats (round(ln·1e6) — the dsir/lm/bm25 pattern,
    same accepted ~1e-9 boundary class) and the key is then a single
    IEEE division of that integer by the integer weight — both
    engines produce the bit-identical double, and ties break on
    doc_id.

    Scale: narrow per-row projection, then the SAME salted two-stage
    top-N as `stratified_sample` (the global sample is one stratum —
    an unsalted global window would sort the corpus on one task)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        hash64(F.col("doc_id").cast("string"), _WS_SALT) + 1
    ) / F.lit(float(_U_DEN))
    keyed = docs.select(
        "doc_id",
        "n_chars",
        (
            F.round(F.log(u) * _LN_QUANT).cast("bigint").cast("double")
            / F.col("n_chars")
        ).alias("priority"),
    ).withColumn("salt", (F.col("doc_id") % _STAGE_SALTS).cast("int"))
    w1 = Window.partitionBy("salt").orderBy(
        F.desc("priority"), "doc_id"
    )
    survivors = (
        keyed.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= WEIGHTED_N)
        .drop("rn", "salt")
    )
    w2 = Window.partitionBy().orderBy(F.desc("priority"), "doc_id")
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= WEIGHTED_N)
        .select("rank", "doc_id", "n_chars")
        .orderBy("rank")
    )


QUERIES = {
    "split_assign": split_assign,
    "split_summary": split_summary,
    "stratified_sample": stratified_sample,
    "weighted_sample": weighted_sample,
}

_BUCKET = f"{hash64_duck('CAST(doc_id AS VARCHAR)', repr(_SPLIT_SALT))} % 100"

ORACLES = {
    "split_assign": f"""
        SELECT doc_id,
               CASE WHEN {_BUCKET} < {TRAIN_PCT}
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
        ORDER BY doc_id
    """,
    "split_summary": f"""
        SELECT split, n_docs,
               {halfup_ratio_sql("_s", "n_docs", engine="duck")}
                   AS avg_len
        FROM (
            SELECT CASE WHEN {_BUCKET} < {TRAIN_PCT}
                        THEN 'train' ELSE 'test' END AS split,
                   count(*) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS _s
            FROM documents
            GROUP BY 1
        )
        ORDER BY split
    """,
    "stratified_sample": f"""
        SELECT event_type, event_id, rn
        FROM (
            SELECT event_type, event_id,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY {hash64_duck("CAST(event_id AS VARCHAR)",
                                             repr(_SAMPLE_SALT))},
                                event_id) AS rn
            FROM events
        )
        WHERE rn <= {STRATA_N}
        ORDER BY event_type, rn
    """,
    "weighted_sample": f"""
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   CAST(CAST(round(
                       ln(({hash64_duck("CAST(doc_id AS VARCHAR)",
                                        repr(_WS_SALT))} + 1)
                          / CAST({_U_DEN} AS DOUBLE))
                       * {_LN_QUANT}) AS BIGINT) AS DOUBLE)
                       / n_chars AS priority
            FROM documents
            WHERE n_chars > 0
        )
        SELECT rank, doc_id, n_chars
        FROM (
            SELECT row_number() OVER (
                       ORDER BY priority DESC, doc_id) AS rank,
                   doc_id, n_chars
            FROM keyed
        )
        WHERE rank <= {WEIGHTED_N}
        ORDER BY rank
    """,
}
