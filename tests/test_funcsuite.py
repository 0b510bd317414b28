"""Array / datetime / ranking function suites: oracle parity plus
the self-checking identities the rank suite is built around."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import funcsuite
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(funcsuite.QUERIES))
def test_funcsuite_vs_oracle(spark, duck, name):
    df = funcsuite.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, funcsuite.ORACLES[name], name=name)


def test_rank_identities_hold(spark):
    """max(row_number)=n, max(dense_rank)=n_buckets, rank between
    them — and the bucketing actually manufactures ties (otherwise
    the three rankings coincide and the query proves nothing)."""
    rows = funcsuite.f_rank_ties(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["max_row_number"] == r["n_rows"]
        assert r["max_dense_rank"] == r["n_buckets"]
        assert r["max_dense_rank"] <= r["max_rank"] <= r["n_rows"]
    assert any(r["n_buckets"] < r["n_rows"] for r in rows)


def test_array_ops_stay_in_codegen(spark):
    """The whole array suite is one narrow projection: no explode,
    no join, one scan."""
    plan = (
        funcsuite.f_array_ops(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan  # explode would plan a Generate
    assert "Join" not in plan
    assert plan.count("FileScan") == 1


def test_datetime_grid_is_bounded(spark):
    """Output is the (quarter x iso-dow) grid — ≤28 rows at ANY
    corpus size, with day numbers in the ISO domain."""
    rows = funcsuite.f_datetime_ops(spark, SF_DIR_ORACLE).collect()
    assert 0 < len(rows) <= 28
    for r in rows:
        assert 1 <= r["quarter"] <= 4
        assert 1 <= r["dow_iso"] <= 7


def test_map_ops_identities(spark):
    """Pure-Python recount of the token-count map identities: the
    map's value fold equals the token total, repeated + singleton
    counts partition the distinct set, probe extraction matches a
    plain count."""
    from collections import Counter

    from bike_analyzer_spark.operators import funcsuite as fs

    docs = {
        r.doc_id: Counter(r.text.strip().split())
        for r in spark.read.parquet(
            f"{SF_DIR_ORACLE}/documents.parquet"
        ).collect()
    }
    got = fs.f_map_ops(spark, SF_DIR_ORACLE).collect()
    assert len(got) == len(docs)
    for r in got:
        c = docs[r.doc_id]
        assert r.n_distinct_tokens == len(c)
        assert r.probe_count == c.get(fs.MAP_PROBE, 0)
        assert r.has_probe == (fs.MAP_PROBE in c)
        assert r.n_repeated == sum(1 for v in c.values() if v >= 2)
        assert r.max_count == max(c.values())
        assert r.n_tokens == sum(c.values())


def test_map_ops_stay_in_codegen(spark):
    """The map never leaves the row: no Generate (explode), no
    shuffle join — one projection then the output sort."""
    from bike_analyzer_spark.operators import funcsuite as fs

    plan = (
        fs.f_map_ops(spark, SF_DIR_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan
