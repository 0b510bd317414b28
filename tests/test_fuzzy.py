"""Blocked fuzzy matching: oracle parity, non-degeneracy, the skew
cap, and an independent scalar edit-distance check."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import fuzzy
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(fuzzy.QUERIES))
def test_fuzzy_vs_oracle(spark, duck, name):
    df = fuzzy.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, fuzzy.ORACLES[name], name=name)


def test_pairs_are_non_degenerate_and_ranked(spark):
    rows = fuzzy.fuzzy_pairs(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == fuzzy.TOP_PAIRS
    dists = [r.edit_dist for r in rows]
    assert dists == sorted(dists)
    assert all(r.a < r.b for r in rows)


def test_blocking_bounds_candidates(spark):
    """No surviving block exceeds the cap, so per-block pair fan-out
    is bounded at BLOCK_CAP^2 regardless of corpus skew."""
    b = fuzzy._blocked(
        fuzzy.load(spark, SF_DIR_ORACLE, "documents")
    )
    worst = (
        b.groupBy("blk").agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()[0]
        .m
    )
    assert worst <= fuzzy.BLOCK_CAP


def test_edit_distance_against_scalar_reference(spark):
    """Spark's levenshtein vs a textbook Python DP on the actual
    reported pairs — pins the verify metric itself, not just
    Spark/DuckDB agreement on it."""

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i] + [0] * len(t)
            for j, ct in enumerate(t, 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (cs != ct),
                )
            prev = cur
        return prev[-1]

    docs = {
        r.doc_id: r.text[: fuzzy.PREFIX_LEN]
        for r in fuzzy.load(spark, SF_DIR_ORACLE, "documents").collect()
    }
    for r in fuzzy.fuzzy_pairs(spark, SF_DIR_ORACLE).collect():
        assert r.edit_dist == lev(docs[r.a], docs[r.b]), (r.a, r.b)


def test_pairs_plan_has_no_cartesian(spark):
    """The blocking contract in the plan: the pair join is an
    equi-join on the block key — no CartesianProduct, no
    BroadcastNestedLoopJoin over documents."""
    plan = (
        fuzzy.fuzzy_pairs(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
