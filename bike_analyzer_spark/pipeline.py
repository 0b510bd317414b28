"""End-to-end corpus build — the single entry point that composes the
engine's training-data stages in production order, landing a
versioned, shuffled, shard-ready corpus:

    scrub PII  →  quality gates  →  exact dedup (keep-first)
    →  train/val split  →  deterministic shard shuffle
    →  versioned commit (snapshot isolation + time travel)

Each stage is the SAME operator the corresponding corpus query /
test exercises (`scrub.scrub_flags`, `quality.rule_flags`,
`sampling` split hash, `sinks.write_shuffled_shards`,
`versioned.commit`), so the pipeline inherits their oracles — this
module adds only composition, no new logic.

Scale notes: scrub + gates + split are ONE fused narrow projection
over the corpus scan; dedup is one hash-aggregate on md5(text); the
shard shuffle is the single intentional global exchange; the
versioned commit is an atomic metadata publish. Re-running the
pipeline over the same inputs commits a byte-identical version
(deterministic end-to-end — pinned in tests), which is what makes a
training set reproducible and auditable after the fact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.textfns import hash64
from .operators.quality import rule_flags
from .operators.scrub import scrub_flags
from .sources import versioned
from .sources.catalog import load
from .sources.sinks import write_shuffled_shards

#: train split share, matching sampling.TRAIN_PCT semantics but keyed
#: on its own salt so pipeline reruns are self-consistent
TRAIN_PCT = 90
_SPLIT_SALT = "pipeline-split"
N_SHARDS = 8


def curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated corpus frame: PII-scrubbed text, quality-gated,
    exact-deduplicated (keep smallest doc_id per identical text),
    split-assigned. Stages fuse: scrub/gate/split are projections,
    dedup is the one aggregate."""
    docs = load(spark, sf_dir, "documents")
    scrubbed = (
        scrub_flags(docs)
        .drop("text", "n_urls", "n_emails", "n_phones")
        .withColumnRenamed("clean_text", "text")
        .select(*docs.columns)
    )
    gated = rule_flags(scrubbed).filter("keep").select(*docs.columns)
    # exact dedup, keep-first: one hash-agg on the text digest
    deduped = (
        gated.withColumn("_h", F.md5("text"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_h").orderBy("doc_id")
            ),
        )
        .filter("_rn = 1")
        .drop("_h", "_rn")
    )
    split = F.when(
        hash64(F.col("doc_id").cast("string"), _SPLIT_SALT) % 100
        < TRAIN_PCT,
        F.lit("train"),
    ).otherwise(F.lit("val"))
    return deduped.withColumn("split", split)


def run_corpus_build(
    spark: SparkSession, sf_dir: str, table_dir: str, n_shards: int = N_SHARDS
) -> dict:
    """Build and publish one corpus version. Returns a small audit
    dict (the numbers a pipeline run should log)."""
    docs = curated_docs(spark, sf_dir).localCheckpoint(eager=False)
    staging = os.path.join(table_dir, "_build.staging")
    write_shuffled_shards(
        docs.filter("split = 'train'").drop("split"), staging, n_shards
    )
    train = spark.read.parquet(staging)
    # publish through the constraint gate: a pipeline bug ships
    # NOTHING rather than a plausible-but-broken training set
    from .sources import constraints as C

    version = C.enforce_commit(
        train,
        table_dir,
        [
            C.not_null("doc_id"),
            C.not_null("text"),
            C.unique("doc_id"),
            C.check("text_nonempty", "length(text) > 0"),
        ],
    )
    n_train = versioned.history(table_dir)[-1]["n_rows"]
    n_total = load(spark, sf_dir, "documents").count()
    n_kept = docs.count()
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return {
        "version": version,
        "docs_in": n_total,
        "docs_kept": n_kept,
        "train_rows": n_train,
        "val_rows": n_kept - n_train,
        "n_shards": n_shards,
    }
