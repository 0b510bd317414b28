"""Evaluation-harness queries (ANN recall, classifier calibration,
MinHash error grid): oracle parity plus the internal-consistency
properties that tie each metric back to the operator it measures."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import dedup, evalsuite, similarity
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(evalsuite.QUERIES))
def test_evalsuite_vs_oracle(spark, duck, name):
    df = evalsuite.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, evalsuite.ORACLES[name], name=name)


def test_recall_bounded_and_complete(spark):
    """One row per brute-force query, hits within [0, k]."""
    rows = evalsuite.ann_recall_ivf(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == similarity.N_QUERIES
    for r in rows:
        assert 0 <= r["n_hits"] <= similarity.TOP_K
        assert 0.0 <= r["recall_pct"] <= 100.0


def test_confusion_counts_cover_corpus(spark):
    """The 4 cells partition the corpus: counts sum to the document
    count and the half-up shares sum to 100 within rounding."""
    df = evalsuite.nbq_confusion(spark, SF_DIR_ORACLE)
    agg = df.agg(
        F.sum("n_docs").alias("n"), F.sum("share_pct").alias("s")
    ).collect()[0]
    n_docs = (
        spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet").count()
    )
    assert agg["n"] == n_docs
    assert abs(agg["s"] - 100.0) < 0.001


def test_error_grid_covers_all_candidates(spark):
    """Every LSH candidate pair lands in exactly one error bucket,
    and buckets stay within the ±K estimator range."""
    grid = evalsuite.minhash_error_profile(spark, SF_DIR_ORACLE)
    rows = grid.collect()
    total = sum(r["n_pairs"] for r in rows)
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    ds = dedup._doc_shingles(docs).localCheckpoint(eager=False)
    sigs = dedup.minhash_signatures(docs, shingles=ds)
    n_cands = dedup.lsh_candidates(sigs).count()
    assert total == n_cands
    for r in rows:
        assert -dedup.MINHASH_K <= r["err_bucket"] <= dedup.MINHASH_K


def test_estimator_not_degenerate(spark):
    """LSH candidates are similarity-biased, so the error grid must
    have mass at small |error| — an all-extremes grid would mean the
    agreement count and the exact sixteenths disagree wholesale
    (e.g. mismatched hash functions between the two stages)."""
    rows = evalsuite.minhash_error_profile(
        spark, SF_DIR_ORACLE
    ).collect()
    near = sum(r["n_pairs"] for r in rows if abs(r["err_bucket"]) <= 4)
    total = sum(r["n_pairs"] for r in rows)
    assert total > 0 and near * 2 > total


def test_label_purity_matches_pure_python(spark):
    """Recount each cluster's label histogram from the operator's own
    assignment and pin purity/entropy arithmetic exactly."""
    import math
    from collections import Counter, defaultdict

    from bike_analyzer_spark.operators import evalsuite as ev, ivf
    from bike_analyzer_spark.sources.catalog import load
    from tests.conftest import SF_DIR_ORACLE as _SF

    asg = {
        r.vec_id: r.centroid_id
        for r in ivf.sim_ivf_assign(spark, _SF).collect()
    }
    labels = {
        r.vec_id: r.label
        for r in load(spark, _SF, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    hist = defaultdict(Counter)
    for v, c in asg.items():
        hist[c][labels[v]] += 1
    got = ev.ivf_label_purity(spark, _SF).collect()
    assert {r.centroid_id for r in got} == set(hist)
    L = lambda x: round(math.log(x) * 1_000_000)  # noqa: E731
    for r in got:
        h = hist[r.centroid_id]
        n = sum(h.values())
        maj_label, maj_n = min(
            h.items(), key=lambda kv: (-kv[1], kv[0])
        )
        assert (r.n_vectors, r.n_labels) == (n, len(h))
        assert (r.majority_label, r.n_majority) == (maj_label, maj_n)
        assert r.purity_pct == ((100 * maj_n * 200 + n) // (2 * n)) / 100
        sfl = sum(f * L(f) for f in h.values())
        assert r.label_entropy_nats == (n * L(n) - sfl) / (n * 1e6)
        # entropy bounds: 0 <= H <= ln(n_labels) (+1 ulp quantization)
        assert -1e-6 <= r.label_entropy_nats <= math.log(len(h)) + 1e-6


def test_quantile_audit_bound_holds_and_matches_python(spark):
    """The one-bucket-width guarantee must hold on every row, and the
    exact side must equal a plain-Python rank quantile."""
    from collections import defaultdict

    from bike_analyzer_spark.operators import evalsuite as ev
    from bike_analyzer_spark.operators.scale import (
        GRID_BUCKETS, GRID_HI, GRID_LO, GRID_QS,
    )
    from tests.conftest import SF_DIR_ORACLE as _SF

    vals = defaultdict(list)
    for r in (
        spark.read.parquet(f"{_SF}/events.parquet")
        .select("event_type", "value")
        .collect()
    ):
        vals[r.event_type].append(round(r.value * 100))
    got = ev.quantile_error_audit(spark, _SF).collect()
    width = (GRID_HI - GRID_LO) / GRID_BUCKETS
    assert len(got) == len(vals) * len(GRID_QS)
    for r in got:
        xs = sorted(vals[r.event_type])
        qn = round(r.q * 1_000_000)
        rank = (len(xs) * qn + 999_999) // 1_000_000
        assert r.exact_value == xs[rank - 1] / 100
        assert r.within_bound
        assert abs(r.err) <= width


def test_probe_curve_monotone_and_ceils_recall(spark):
    """The two laws the probe curve exists for: coverage is
    monotone in the probe budget, and coverage at the deployed
    N_PROBE is an upper bound on the measured recall@k (a neighbor
    whose list is never probed cannot be returned — the routing
    ceiling)."""
    from bike_analyzer_spark.operators.ivf import N_PROBE

    curve = {
        r.n_probe: (r.covered, r.n_true)
        for r in evalsuite.ann_probe_curve(spark, SF_DIR_ORACLE).collect()
    }
    budgets = sorted(curve)
    for lo, hi in zip(budgets, budgets[1:]):
        assert curve[lo][0] <= curve[hi][0], "coverage must be monotone"
    covered_at_deploy, n_true = curve[N_PROBE]
    total_hits = sum(
        r.n_hits
        for r in evalsuite.ann_recall_ivf(spark, SF_DIR_ORACLE).collect()
    )
    assert total_hits <= covered_at_deploy, (
        "measured recall exceeded the routing ceiling: "
        f"{total_hits} hits vs {covered_at_deploy}/{n_true} covered"
    )
