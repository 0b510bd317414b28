"""Distribution diagnostics: oracle parity, a pure-Python semantic
twin (the micro-nat algebra really computes entropy/KL/JSD), the
information-theoretic bounds, and partition invariance."""

import math
from collections import Counter

import pytest

from bike_analyzer_spark.operators import divergence
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(divergence.QUERIES))
def test_vs_oracle(spark, duck, name):
    df = divergence.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, divergence.ORACLES[name], name=name)


def _py_dists(spark, sf_dir):
    """Per-source and corpus unigram Counters, straight off the
    parquet text — no Spark expressions involved."""
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    per = {}
    for r in rows:
        per.setdefault(r.source, Counter()).update(r.text.strip().split())
    corpus = Counter()
    for c in per.values():
        corpus.update(c)
    return per, corpus


def test_entropy_kl_match_pure_python(spark):
    """Exact-integer entropy/KL agree with float-accumulated Shannon
    formulas to well inside the micro-nat quantization error."""
    per, corpus = _py_dists(spark, SF_DIR_SMOKE)
    got = {
        r.source: r
        for r in divergence.domain_entropy(spark, SF_DIR_SMOKE).collect()
    }
    assert set(got) == set(per)
    g_tot = sum(corpus.values())
    for src, cnt in per.items():
        t = sum(cnt.values())
        h = -sum(f / t * math.log(f / t) for f in cnt.values())
        kl = sum(
            f / t * math.log((f / t) / (corpus[w] / g_tot))
            for w, f in cnt.items()
        )
        assert got[src].n_tokens == t
        assert got[src].vocab_size == len(cnt)
        assert math.isclose(got[src].entropy_nats, h, abs_tol=1e-5)
        assert math.isclose(got[src].kl_vs_corpus_nats, kl, abs_tol=1e-5)
        assert math.isclose(
            got[src].cross_entropy_nats, h + kl, abs_tol=1e-5
        )


def test_jsd_matches_pure_python(spark):
    """The integer-ratio JSD (co-occurring terms + folded uncovered
    mass) equals the textbook ½KL(p‖m)+½KL(q‖m)."""
    per, _ = _py_dists(spark, SF_DIR_SMOKE)
    rows = divergence.domain_jsd_pairs(spark, SF_DIR_SMOKE).collect()
    srcs = sorted(per)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    by_pair = {(r.sa, r.sb): r for r in rows}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            ca, cb = per[sa], per[sb]
            ta, tb = sum(ca.values()), sum(cb.values())
            jsd = 0.0
            for w in set(ca) | set(cb):
                p, q = ca[w] / ta, cb[w] / tb
                m = (p + q) / 2
                if p:
                    jsd += 0.5 * p * math.log(p / m)
                if q:
                    jsd += 0.5 * q * math.log(q / m)
            r = by_pair[(sa, sb)]
            assert r.shared_terms == len(set(ca) & set(cb))
            assert math.isclose(r.jsd_nats, jsd, abs_tol=1e-5)


def test_information_bounds(spark):
    """0 ≤ JSD ≤ ln2; entropy ≤ ln(vocab); KL ≥ 0; cross = H + KL."""
    ent = divergence.domain_entropy(spark, SF_DIR_ORACLE).collect()
    assert ent
    for r in ent:
        assert 0.0 <= r.entropy_nats <= math.log(r.vocab_size) + 1e-6
        assert r.kl_vs_corpus_nats >= -1e-9
        assert math.isclose(
            r.cross_entropy_nats,
            r.entropy_nats + r.kl_vs_corpus_nats,
            abs_tol=1e-9,
        )
    jsd = divergence.domain_jsd_pairs(spark, SF_DIR_ORACLE).collect()
    assert jsd
    for r in jsd:
        assert -1e-9 <= r.jsd_nats <= math.log(2) + 1e-6


def test_partition_invariance(spark):
    """Integer micro-nat sums are partition-order invariant — the
    reproducibility property double-accumulating entropy lacks."""
    base = divergence.domain_entropy(spark, SF_DIR_ORACLE).collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        other = divergence.domain_entropy(spark, SF_DIR_ORACLE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert sorted(map(tuple, base)) == sorted(map(tuple, other))
