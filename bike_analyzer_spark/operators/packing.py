"""Sequence packing — the training-data step between curation and the
dataloader: documents are concatenated in a deterministic order and
chunked into fixed-length context windows (the GPT-style "concat and
split at L" packing; Brown et al. 2020 §2.2 describe packing multiple
documents per sequence with the EOT delimiter).

The core primitive is an EXCLUSIVE PREFIX SUM of per-document token
counts over the global doc_id order — inherently sequential-looking,
made distributed with the classic two-level scan:

  1. bucket docs by doc_id range (width SCAN_BUCKET);
  2. aggregate per-bucket token totals — a metadata-sized frame
     (|docs| / SCAN_BUCKET rows), cumulated with one tiny window and
     BROADCAST back (same bounded-frame pattern as IVF's centroid
     table);
  3. within each bucket, a window cumsum partitioned BY BUCKET — the
     big-data side never sees a global single-partition window.

At another ~4096x beyond that, step 2's bucket frame itself gets the
same treatment (scans compose); one level covers ~4096 * 4096 docs
per executor-scale unit, so a second level is the 100 TB story.

No reference counterpart (the reference has no training-data surface);
this extends the LLM-pipeline pack alongside dedup/quality/sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import tokens
from ..sources.catalog import load

#: tokens per packed training sequence
CONTEXT_LEN = 512
#: doc_ids per scan bucket (level-1 fan-in of the distributed scan)
SCAN_BUCKET = 4096

_TOKS = "string_split_regex(trim(text), '\\s+')"


def _with_start_tok(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) -> + start_tok, the exclusive prefix sum of
    n_tokens in doc_id order, via the two-level distributed scan."""
    d = docs.select(
        "doc_id",
        "n_tokens",
        (F.col("doc_id") / SCAN_BUCKET).cast("bigint").alias("bucket"),
    )
    per_bucket = d.groupBy("bucket").agg(F.sum("n_tokens").alias("bn"))
    # bucket frame is |docs|/SCAN_BUCKET rows — metadata-sized, so the
    # unpartitioned window is a bounded single task, like a centroid
    # table, not a data-sized global sort
    w_bucket = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "bucket",
        F.coalesce(F.sum("bn").over(w_bucket), F.lit(0)).alias("bucket_off"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.withColumn(
            "local_off", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
        )
        .join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("bucket_off") + F.col("local_off")).alias("start_tok"),
        )
    )


def pack_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document packing assignment: global token offset, the pack
    (training sequence) its first token lands in, and whether the doc
    straddles a pack boundary (split across two sequences at train
    time)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).cast("bigint").alias("n_tokens")
    )
    out = _with_start_tok(docs)
    pack = F.floor(F.col("start_tok") / CONTEXT_LEN).cast("bigint")
    last_pack = F.floor(
        (F.col("start_tok") + F.col("n_tokens") - 1) / CONTEXT_LEN
    ).cast("bigint")
    return out.select(
        "doc_id",
        "n_tokens",
        "start_tok",
        pack.alias("pack_id"),
        (pack != last_pack).alias("spans_boundary"),
    ).orderBy("doc_id")


def pack_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pack roll-up: docs starting in the pack, tokens they bring,
    and how many straddle into the next pack — the packing-efficiency
    view (boundary docs are the cross-attention-contamination signal
    packing pipelines track)."""
    a = pack_assign(spark, sf_dir)
    return (
        a.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens_started"),
            F.sum(F.col("spans_boundary").cast("bigint")).alias("n_spanning"),
        )
        .orderBy("pack_id")
    )


QUERIES = {
    "pack_assign": pack_assign,
    "pack_summary": pack_summary,
}

_ASSIGN_SQL = f"""
    WITH t AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS start_tok
        FROM t
    )
    SELECT doc_id, n_tokens, start_tok,
           CAST(floor(start_tok / {CONTEXT_LEN}) AS BIGINT) AS pack_id,
           floor(start_tok / {CONTEXT_LEN})
               <> floor((start_tok + n_tokens - 1) / {CONTEXT_LEN})
               AS spans_boundary
    FROM c
"""

ORACLES = {
    "pack_assign": f"{_ASSIGN_SQL} ORDER BY doc_id",
    "pack_summary": f"""
        WITH a AS ({_ASSIGN_SQL})
        SELECT pack_id,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens_started,
               CAST(sum(CASE WHEN spans_boundary THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_spanning
        FROM a GROUP BY pack_id ORDER BY pack_id
    """,
}
