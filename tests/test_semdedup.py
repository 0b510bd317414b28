"""SemDeDup cluster-then-prune: oracle parity, agreement with the IVF
assignment it composes, and the semantic invariants of the keeper
rule (non-degeneracy, dominance-keeper survival, reimplementation)."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import ivf, semdedup
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(semdedup.QUERIES))
def test_semdedup_vs_oracle(spark, duck, name):
    df = semdedup.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, semdedup.ORACLES[name], name=name)


def test_prune_is_non_degenerate(spark):
    """Tau must sit inside the corpus's cosine band: some vectors
    drop, most survive. A tau drift that silently turns the prune
    into the identity (r6: the synthetic embeddings are
    near-orthogonal, so 0.95 drops NOTHING) fails here."""
    k = semdedup.semdedup_keep(spark, SF_DIR_ORACLE)
    n = k.count()
    dropped = k.filter(~F.col("keep")).count()
    assert 0 < dropped < n // 2


def test_clusters_agree_with_ivf_assign(spark):
    """SemDeDup's cluster column IS the IVF assignment — both build
    the same index, so they must agree vector-for-vector."""
    sd = {
        r.vec_id: r.centroid_id
        for r in semdedup.semdedup_keep(spark, SF_DIR_SMOKE).collect()
    }
    iv = {
        r.vec_id: r.centroid_id
        for r in ivf.sim_ivf_assign(spark, SF_DIR_SMOKE).collect()
    }
    assert sd == iv


def test_keeper_rule_reimplementation(spark):
    """Independent per-cluster reimplementation in plain Python: a
    vector is dropped iff a dominating same-cluster vector sits
    within tau (single-step dominance, no cascade)."""
    import itertools
    import math

    a = semdedup._clustered(spark, SF_DIR_SMOKE).collect()
    verdict = {
        r.vec_id: r.keep
        for r in semdedup.semdedup_keep(spark, SF_DIR_SMOKE).collect()
    }

    def cos9(u, v):
        d = sum(x * y for x, y in zip(u, v))
        nu = math.sqrt(sum(x * x for x in u))
        nv = math.sqrt(sum(x * x for x in v))
        return round(d / (nu * nv), 9)

    by_cluster = {}
    for r in a:
        by_cluster.setdefault(r.centroid_id, []).append(r)
    expect = {r.vec_id: True for r in a}
    for members in by_cluster.values():
        for x, b in itertools.permutations(members, 2):
            dominates = (x.score9, -x.vec_id) > (b.score9, -b.vec_id)
            if dominates and cos9(x.embedding, b.embedding) >= semdedup.SEM_TAU:
                expect[b.vec_id] = False
    assert verdict == expect


def test_best_per_cluster_always_survives(spark):
    """The closest-to-centroid member of every cluster is dominated
    by nobody, so it must always be kept."""
    rows = semdedup._with_keep(
        semdedup._clustered(spark, SF_DIR_SMOKE)
    ).collect()
    best = {}
    for r in rows:
        key = (r.score9, -r.vec_id)
        if r.centroid_id not in best or key > best[r.centroid_id][0]:
            best[r.centroid_id] = (key, r.keep)
    assert all(keep for _, keep in best.values())


def test_cluster_size_stays_bounded_across_sf(spark):
    """The r7 corpus-scaled K contract: expected cluster size is
    pinned near TARGET_LIST_SIZE at EVERY scale factor (sf0.01 trains
    the K_MIN floor, sf0.1 trains K=32), so semdedup's within-cluster
    quadratic stays flat per cluster as the corpus grows. Max size is
    allowed 2x the target (hash-random imbalance), never the N/16 the
    pinned-K design would produce."""
    from pyspark.sql import functions as F

    from bike_analyzer_spark.operators import ivf
    from bike_analyzer_spark.operators.similarity import _with_norm
    from bike_analyzer_spark.sources.catalog import load
    from tests.conftest import SF_DIR_ORACLE

    for sf, want_k in [(SF_DIR_ORACLE, 16), ("/root/testdata/sf0.1", 32)]:
        emb = _with_norm(load(spark, sf, "embeddings"))
        a = ivf._assigned(
            emb, ivf._centroid_row(ivf._index_centroids(spark, sf, emb))
        )
        sizes = [
            r.n
            for r in a.groupBy("centroid_id")
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        n = emb.count()
        assert len(sizes) == want_k == ivf._k_train(n)[0]
        assert max(sizes) <= 2 * ivf.TARGET_LIST_SIZE, (sf, max(sizes))
