"""Iterative graph operators — connected components by min-label
propagation, driving near-duplicate CLUSTERING (the step a real
training-data dedup pipeline runs after pair detection: group
transitively-linked near-dups, keep one canonical doc per cluster).

This is the engine's genuinely ITERATIVE algorithm (builder brief:
"for genuinely non-SQL-expressible ops (... iterative algorithms)
omit the oracle_sql entry"): a driver loop over DataFrame joins with
convergence detection. Each iteration:

    msgs   = min neighbor label per vertex      (join + groupBy)
    labels = min(own label, best message)       (left join)

converging in O(diameter) iterations. `localCheckpoint` truncates
lineage each round so plans don't grow with iterations. At 100 TB
scale the same loop holds (labels/messages shuffle on vertex id);
for adversarial diameters the known refinement is the large-star/
small-star algorithm (Kiveris et al.), which this API could swap in
without changing callers.

Determinism: labels are vertex-id minima — no tie ambiguity at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load

MAX_ITER = 25


def connected_components(edges: DataFrame, max_iter: int = MAX_ITER) -> DataFrame:
    """edges: (a, b) undirected. Returns (id, component) with
    component = min vertex id reachable."""
    # checkpoint the edge list once: every iteration (and its
    # convergence count) re-reads it, and without this the FULL
    # upstream pipeline (e.g. the Jaccard pair computation) would
    # re-execute per iteration
    bidir = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint()
    )
    labels = (
        bidir.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    ).localCheckpoint()
    for _ in range(max_iter):
        msgs = (
            bidir.join(labels, bidir.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("msg"))
        )
        new_best = F.least(
            F.col("component"), F.coalesce("msg", F.col("component"))
        )
        # carry the changed flag in-row: the convergence check is then
        # a filter-count on the (already materialized) checkpoint, not
        # an extra join against the previous labels
        new_labels = (
            labels.join(msgs, "id", "left")
            .select(
                "id",
                new_best.alias("component"),
                (new_best < F.col("component")).alias("_changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter("_changed").count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    # Returning unconverged labels would silently split components
    # (e.g. a >max_iter-hop chain) — fail loudly instead.
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        f"({changed} labels still changing); raise max_iter (diameter "
        "bound) or switch to a large-star/small-star variant"
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: the top within-source n-gram-Jaccard pairs
    (dedup.dedup_ngram_jaccard) become edges; connected components
    assign each linked doc to a cluster keyed by its minimum doc_id —
    the keep-one-per-cluster dedup decision."""
    from .dedup import dedup_ngram_jaccard

    edges = dedup_ngram_jaccard(spark, sf_dir).select("a", "b")
    comps = connected_components(edges)
    return comps.select(
        F.col("component").alias("cluster_root"),
        F.col("id").alias("doc_id"),
        (F.col("id") == F.col("component")).alias("is_kept"),
    ).orderBy("cluster_root", "doc_id")


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """Weighted PageRank over directed edges (src, dst, weight) —
    fixed iteration count (deterministic), dangling mass redistributed
    uniformly. Each round is one join + one aggregate, shuffling on
    vertex id; localCheckpoint bounds lineage.

    edges with weight <= 0 are rejected (they would silently corrupt
    the out-weight normalization)."""
    e = edges.select(
        F.col("src"), F.col("dst"), F.col("weight").cast("double")
    ).localCheckpoint()
    if e.filter(F.col("weight") <= 0).limit(1).count() > 0:
        raise ValueError("pagerank requires strictly positive edge weights")
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_w = e.groupBy("src").agg(F.sum("weight").alias("out_w"))
    # edge transition probability, computed once
    trans = e.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("p")
    ).localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    has_out = out_w.select(F.col("src").alias("id"), F.lit(1).alias("_has"))
    for _ in range(iterations):
        contrib = (
            trans.join(ranks, trans.src == ranks.id)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("c"))
        )
        # dangling mass as a broadcast 1-row aggregate folded into the
        # same action as the rank update — a driver-side .first() here
        # would add an extra job per iteration
        dangling = (
            ranks.join(has_out, "id", "left")
            .filter(F.col("_has").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def od_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Station importance in the OD flow graph: PageRank over the
    inferred (o, d, flow) edges, top-20. The 'which stations anchor
    the network' analysis the reference's dashboard hints at but
    never computes."""
    from .od import infer_flows

    edges = infer_flows(spark, sf_dir, minutes=10).select(
        F.col("o").alias("src"), F.col("d").alias("dst"),
        F.col("flow").alias("weight"),
    )
    ranks = pagerank(edges)
    return (
        ranks.select("id", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), "id")
        .limit(20)
    )


QUERIES = {
    "dedup_clusters": dedup_clusters,
    "od_pagerank": od_pagerank,
}

# Iterative fixpoint -> no oracle_sql (driver records rows-only);
# pytest pins it against a union-find reimplementation and synthetic
# component topologies.
ORACLES: dict[str, str] = {}
