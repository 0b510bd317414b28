"""BM25 ranked retrieval: driver-style oracle parity, the
integer-exact scoring decomposition, and the one-pass plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import retrieval
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_bm25_vs_oracle(spark, duck):
    df = retrieval.bm25_topk(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, retrieval.ORACLES["bm25_topk"], name="bm25_topk"
    )


def test_bm25_matches_float_reference(spark):
    """Independent reimplementation: classic floating-point Okapi
    BM25 over python token lists must agree with the integer-exact
    engine scores to within the micro-nat quantization (each of the
    |Q| per-term contributions carries <=0.5 µnat of idf rounding
    plus 0.5 µnat of final half-up)."""
    docs = {
        r.doc_id: r.text.split()
        for r in spark.read.parquet(
            f"{SF_DIR_ORACLE}/documents.parquet"
        ).collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    k1, b = 1.2, 0.75
    df_t = {
        t: sum(1 for toks in docs.values() if t in toks)
        for t in retrieval.QUERY_TERMS
    }
    idf = {
        t: math.log((n - d + 0.5) / (d + 0.5) + 1)
        for t, d in df_t.items()
    }

    def score(toks):
        s = 0.0
        for t in retrieval.QUERY_TERMS:
            tf = toks.count(t)
            if tf:
                s += (
                    idf[t]
                    * tf
                    * (k1 + 1)
                    / (tf + k1 * (1 - b + b * len(toks) / avgdl))
                )
        return s

    got = retrieval.bm25_topk(spark, SF_DIR_ORACLE).collect()
    assert len(got) == retrieval.TOP_K
    tol = len(retrieval.QUERY_TERMS) * 1.0 / retrieval.QUANT
    for r in got:
        assert r.bm25 == pytest.approx(
            score(docs[r.doc_id]), abs=tol
        ), r.doc_id
    # and the ranking itself is the float ranking (ties on doc_id)
    want_order = sorted(
        docs, key=lambda d: (-score(docs[d]), d)
    )[: retrieval.TOP_K]
    assert [r.doc_id for r in got] == want_order


def test_bm25_plan_is_one_pass(spark):
    """One corpus materialization (the narrow stats frame is
    checkpointed and feeds both the 1-row aggregate and the scoring
    projection), a single-partition exchange for the corpus stats,
    and a bounded TakeOrderedAndProject — never a global sort."""
    plan = (
        retrieval.bm25_topk(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.count("FileScan") == 0  # both consumers read the RDD
    assert "BatchEvalPython" not in plan


def test_contribution_math_survives_web_scale_operands(spark, duck):
    """The per-term contribution must stay exact when the corpus
    token count S pushes the num/den products past 2^63 (S = 1e10 ≈
    a 50 GB corpus — the fixtures never reach it, so this pins the
    widen-then-multiply convention directly): Spark, DuckDB, and
    python bigint half-up must all agree."""
    from decimal import ROUND_HALF_UP, Decimal

    from bike_analyzer_spark.functions.exact import halfup_div_wide_sql
    from bike_analyzer_spark.operators.retrieval import BD, BN, K1D, K1N

    idf, tf, S, dl, n = 15_000_000, 2, 10**10, 100, 10**8
    num_i = idf * tf * (K1N + K1D) * BD * S
    den_i = tf * K1D * BD * S + S * K1N * (BD - BN) + dl * K1N * BN * n
    assert num_i > 2**63  # the pre-multiply genuinely exceeds bigint
    want = int(
        (Decimal(num_i) / Decimal(den_i)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )

    s_num = (
        f"CAST({idf} AS DECIMAL(38,0)) * {tf} * {(K1N + K1D) * BD} * {S}"
    )
    s_den = (
        f"CAST({tf} AS DECIMAL(38,0)) * {K1D * BD} * {S}"
        f" + CAST({S} AS DECIMAL(38,0)) * {K1N * (BD - BN)}"
        f" + CAST({dl} AS DECIMAL(38,0)) * {K1N * BN} * {n}"
    )
    [got_s] = spark.range(1).selectExpr(
        f"{halfup_div_wide_sql(s_num, s_den, 'spark')} AS h"
    ).collect()

    d_num = f"CAST({idf} AS HUGEINT) * {tf} * {(K1N + K1D) * BD} * {S}"
    d_den = (
        f"CAST({tf} AS HUGEINT) * {K1D * BD} * {S}"
        f" + CAST({S} AS HUGEINT) * {K1N * (BD - BN)}"
        f" + CAST({dl} AS HUGEINT) * {K1N * BN} * {n}"
    )
    [(got_d,)] = duck.execute(
        f"SELECT {halfup_div_wide_sql(d_num, d_den, 'duck')}"
    ).fetchall()
    assert got_s.h == got_d == want


def test_rrf_vs_oracle(spark, duck):
    df = retrieval.rrf_fusion(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, retrieval.ORACLES["rrf_fusion"], name="rrf_fusion"
    )


def test_rrf_matches_pure_python(spark):
    """Independent fusion: numpy cosine ranking against the top-1
    lexical doc's embedding + the engine-validated BM25 ranking,
    fused with exact Fraction reciprocals, reproduces the top-20."""
    from fractions import Fraction

    import numpy as np

    lex = sorted(
        (
            (-r.score_u, r.doc_id)
            for r in retrieval.bm25_scored(spark, SF_DIR_ORACLE).collect()
        ),
    )
    rank_lex = {
        d: i + 1 for i, (_, d) in enumerate(lex[: retrieval.RRF_POOL])
    }
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(
            f"{SF_DIR_ORACLE}/embeddings.parquet"
        ).collect()
    }
    q = emb[lex[0][1]]
    qn = math.sqrt(float((q * q).sum()))
    cos = {
        v: round(
            float((q * e).sum()) / (qn * math.sqrt(float((e * e).sum()))),
            4,
        )
        for v, e in emb.items()
    }
    dense = sorted(((-c, v) for v, c in cos.items()))
    rank_dense = {
        v: i + 1 for i, (_, v) in enumerate(dense[: retrieval.RRF_POOL])
    }

    def recip(r):
        if not r:
            return 0
        # half-up of QUANT/(K+r) as an exact rational
        return int(
            (
                Fraction(retrieval.QUANT, retrieval.RRF_K + r)
                + Fraction(1, 2)
            ).__floor__()
        )

    want = sorted(
        (
            (
                -(recip(rank_lex.get(d, 0)) + recip(rank_dense.get(d, 0))),
                d,
            )
            for d in set(rank_lex) | set(rank_dense)
        ),
    )[: retrieval.RRF_TOP_K]
    got = retrieval.rrf_fusion(spark, SF_DIR_ORACLE).collect()
    assert [(r.doc_id, r.rrf_u) for r in got] == [
        (d, -u) for u, d in want
    ]
    for r in got:
        assert r.rank_lex == rank_lex.get(r.doc_id, 0)
        assert r.rank_dense == rank_dense.get(r.doc_id, 0)
        assert math.isclose(r.rrf, r.rrf_u / retrieval.QUANT)
