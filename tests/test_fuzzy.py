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


def test_entity_clusters_match_union_find(spark):
    """Independent resolve: plain union-find over python-recomputed
    match edges reproduces every multi-member entity."""
    from collections import defaultdict

    from tests.conftest import SF_DIR_ORACLE

    docs = [
        (r.doc_id, r.text)
        for r in spark.read.parquet(
            f"{SF_DIR_ORACLE}/documents.parquet"
        ).collect()
    ]
    blocks = defaultdict(list)
    for did, text in docs:
        toks = text.strip().split()
        blocks[" ".join(toks[:2])].append(
            (did, text[: fuzzy.PREFIX_LEN])
        )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[-1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for members in blocks.values():
        if len(members) > fuzzy.BLOCK_CAP:
            continue
        for i, (a, pa) in enumerate(members):
            for b, pb in members[i + 1:]:
                if lev(pa, pb) <= fuzzy.MATCH_DIST:
                    union(a, b)
    want = defaultdict(set)
    for x in parent:
        want[find(x)].add(x)
    want = {
        min(v): sorted(v) for v in want.values() if len(v) >= 2
    }
    got = {
        r.canonical_id: [int(m) for m in r.members.split(",")]
        for r in fuzzy.entity_clusters(spark, SF_DIR_ORACLE).collect()
    }
    assert got == want
