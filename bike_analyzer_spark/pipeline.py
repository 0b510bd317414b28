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
    dict (the numbers a pipeline run should log).

    The audit counts ride Spark's OBSERVED-METRICS API
    (`DataFrame.observe`): the metrics accumulate inside the shard
    write's own pass — the curated frame is never re-scanned just to
    count it (at 100 TB a `.count()` audit is a second full corpus
    scan). The observe node sits BELOW the train filter and the lazy
    checkpoint, so the one materializing action sees every curated
    row, train and val."""
    from pyspark.sql import Observation

    obs = Observation("corpus_build_audit")
    docs = (
        curated_docs(spark, sf_dir)
        # checkpoint FIRST, observe ABOVE it: CollectMetrics
        # accumulators register with the query that executes them, and
        # a lazily-materialized checkpoint runs its subtree as an
        # internal RDD job the outer query's listener never sees —
        # metrics below the checkpoint boundary read back as zeros
        .localCheckpoint(eager=False)
        .observe(
            obs,
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum((F.col("split") == "train").cast("long")).alias(
                "train_seen"
            ),
            F.min(F.length("text")).alias("min_text_len"),
        )
    )
    staging = os.path.join(table_dir, "_build.staging")
    write_shuffled_shards(
        docs.filter("split = 'train'").drop("split"), staging, n_shards
    )
    audit = obs.get
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
    n_kept = audit["docs_kept"]
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return {
        "version": version,
        "docs_in": n_total,
        "docs_kept": n_kept,
        "train_rows": n_train,
        "val_rows": n_kept - n_train,
        "min_text_len": audit["min_text_len"],
        "n_shards": n_shards,
    }
