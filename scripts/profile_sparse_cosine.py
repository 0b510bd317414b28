"""Stage-time decomposition for sim_sparse_cosine (r10 verdict ask
#6): times each sub-frame of the pipeline end-to-end through the
noop sink at one SF, so the corpus-worst 10x scaling ratio can be
attributed to a stage (shingle explode/tf, df filter, weight join,
posting self-join + pair aggregate, norm joins + 128-bit division).

Stage N's time INCLUDES its upstream stages (each run executes the
lineage from the parquet scan), so the per-stage increment is the
difference between consecutive rows. localCheckpoint reuse inside
one run mirrors the real query's plan.

Usage: python scripts/profile_sparse_cosine.py [sf_dir] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bike_analyzer_spark.operators.setjoin import (  # noqa: E402
    COSINE_DF_CAP,
    IDF_QUANT,
    TOP_COSINE,
)
from bike_analyzer_spark.functions.textfns import (  # noqa: E402
    shingle_exprs,
    tokens,
)
from bike_analyzer_spark.session import get_spark  # noqa: E402
from bike_analyzer_spark.sources.catalog import load  # noqa: E402


def stages(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.withColumn("toks", tokens("text"))
        .select("doc_id", F.explode(shingle_exprs("toks", 3)).alias("sh"))
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    n1 = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = (
        tf.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= COSINE_DF_CAP)
    )
    w = (
        tf.join(dfreq, "sh")
        .crossJoin(F.broadcast(n1))
        .select(
            "doc_id",
            "sh",
            (
                F.col("tf")
                * F.expr(
                    f"CAST(round(ln(n_docs / df) * {IDF_QUANT}) AS BIGINT)"
                )
            ).alias("w"),
        )
        .filter(F.col("w") > 0)
        .localCheckpoint(eager=False)
    )
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("n2")
    )
    dots = (
        w.select(F.col("doc_id").alias("a"), "sh", F.col("w").alias("wa"))
        .join(
            w.select(
                F.col("doc_id").alias("b"), "sh", F.col("w").alias("wb")
            ),
            "sh",
        )
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    final = (
        dots.join(
            norms.select(
                F.col("doc_id").alias("a"), F.col("n2").alias("n2a")
            ),
            "a",
        )
        .join(
            norms.select(
                F.col("doc_id").alias("b"), F.col("n2").alias("n2b")
            ),
            "b",
        )
        .select(
            "a",
            "b",
            F.expr(
                "(CAST(dot AS DECIMAL(38,0)) * dot * 1000000)"
                " div (CAST(n2a AS DECIMAL(38,0)) * n2b)"
            ).alias("cos2_ppm"),
        )
        .orderBy(F.desc("cos2_ppm"), "a", "b")
        .limit(TOP_COSINE)
    )
    return [
        ("1_tf", tf),
        ("2_dfreq", dfreq),
        ("3_weights", w),
        ("4_norms", norms),
        ("5_dots", dots),
        ("6_final", final),
    ]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="profile-sparse-cosine")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm
    rows = []
    for name, frame in stages(spark, sf_dir):
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            frame.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        n = frame.count()
        rows.append((name, round(statistics.median(samples), 3), n))
    print(f"\n{sf_dir} (p50 of {reps}, cumulative lineage):")
    prev = 0.0
    for name, sec, n in rows:
        print(f"  {name:<10} {sec:7.3f}s  (+{sec - prev:6.3f})  rows={n}")
        prev = sec
    return 0


if __name__ == "__main__":
    sys.exit(main())
