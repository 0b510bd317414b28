"""PQ ANN: oracle parity, code-packing correctness via an independent
explode-based argmin, recall floor vs the exact brute force, and the
no-corpus-shuffle plan contract (mirrors tests/test_ivf.py)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import pq
from bike_analyzer_spark.operators.similarity import _with_norm
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(pq.QUERIES))
def test_pq_vs_oracle(spark, duck, name):
    df = pq.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, pq.ORACLES[name], name=name)


def test_encode_is_true_argmin(spark):
    """The fold-based per-subspace codeword choice equals an
    independent explode + row_number reimplementation (M_SUB*K_SUB-way
    row blow-up — fine at sf0.001, rejected as the production plan),
    and the packed bigint decodes back to exactly those choices."""
    emb_n = _with_norm(load(spark, SF_DIR_SMOKE, "embeddings"))
    cb = pq._codebook(emb_n)
    enc = pq._encoded(emb_n, pq._codebook_row(cb))

    got = {}
    for r in enc.select("vec_id", "code").collect():
        code = r.code
        got[r.vec_id] = tuple(
            (code // (pq.K_SUB**m)) % pq.K_SUB for m in range(pq.M_SUB)
        )

    pairs = emb_n.crossJoin(cb).select(
        "vec_id",
        "m",
        "j",
        F.round(
            pq._l2sq(
                F.transform(
                    pq._sub(F.col("embedding"), F.col("m")),
                    lambda x: x.cast("double"),
                ),
                F.col("cw"),
            ),
            9,
        ).alias("s"),
    )
    w = Window.partitionBy("vec_id", "m").orderBy(F.asc("s"), F.asc("j"))
    want = {}
    for r in (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    ):
        want.setdefault(r.vec_id, [None] * pq.M_SUB)[r.m] = r.j
    want = {k: tuple(v) for k, v in want.items()}
    assert got == want and len(got) > 0


def test_recall_floor_vs_bruteforce(spark):
    """Two-stage ADC + exact re-rank must keep recall vs the exact
    top-k: measured 0.83 at sf0.01 with RERANK=100 (4-bit ADC is a
    coarse ranker on this corpus — see pq.RERANK's comment); the
    floor pins against regression."""
    from bike_analyzer_spark.operators.similarity import sim_topk_bruteforce

    bf = {
        (r.query_id, r.neighbor_id)
        for r in sim_topk_bruteforce(spark, SF_DIR_ORACLE)
        .select("query_id", "neighbor_id")
        .collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in pq.sim_pq_topk(spark, SF_DIR_ORACLE)
        .select("query_id", "neighbor_id")
        .collect()
    }
    assert len(bf & got) / len(bf) >= 0.75


def test_encode_plan_never_shuffles_corpus(spark):
    """Scale contract: encoding is a narrow projection over one corpus
    scan — no shuffle join, no explode, no cartesian product anywhere
    downstream of the (eagerly checkpointed, bounded-sample) codebook.
    The only join is the 1-row broadcast codebook crossJoin."""
    plan = (
        pq.sim_pq_encode(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" not in plan


def test_topk_plan_never_shuffles_corpus(spark):
    """ADC search streams codes against broadcast query tables; the
    only Exchanges are broadcasts and the window partitioning of the
    ALREADY-REDUCED candidate set."""
    plan = (
        pq.sim_pq_topk(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" not in plan


def test_compression_ratio_and_reconstruction(spark):
    """The storage story PQ exists for: every vector compresses to one
    bigint (8 bytes vs 256 for 64 float32s = 32x) with finite,
    nonnegative reconstruction error, and codes use the full 4-bit
    range of at least one subspace (i.e. quantization is not
    degenerate)."""
    enc = pq.sim_pq_encode(spark, SF_DIR_SMOKE).collect()
    assert len(enc) > 0
    max_code = pq.K_SUB**pq.M_SUB - 1
    assert all(0 <= r.code <= max_code for r in enc)
    assert all(r.recon_err is not None and r.recon_err >= 0 for r in enc)
    # non-degeneracy, per-subspace (unpack digit m as
    # (code >> bits*m) & (K_SUB-1)): at least one subspace must use
    # its FULL K_SUB codeword range — the docstring's actual claim
    # (round-7 ADVICE tightened this from ">2 distinct codes"; the
    # trained codebook currently saturates all 16 codewords in EVERY
    # subspace, so the full-range assert has headroom) — and no
    # subspace may collapse to a 1-or-2-centroid split
    bits = pq.K_SUB.bit_length() - 1
    digit_diversity = [
        len({(r.code >> (bits * m)) & (pq.K_SUB - 1) for r in enc})
        for m in range(pq.M_SUB)
    ]
    assert max(digit_diversity) == pq.K_SUB, digit_diversity
    assert min(digit_diversity) > 2, digit_diversity
