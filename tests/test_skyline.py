"""Skyline correctness: oracle parity plus the O(n^2) brute-force
domination definition replayed in Python — the window rewrite must
agree with the definition it optimizes."""

import duckdb

from bike_analyzer_spark.operators import analytics_ext
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_skyline_parts_vs_oracle(spark, duck):
    assert_matches_oracle(
        analytics_ext.skyline_parts(spark, SF_DIR_ORACLE),
        duck,
        analytics_ext.ORACLES["skyline_parts"],
        name="skyline_parts",
    )


def test_skyline_matches_bruteforce(spark):
    parts = duckdb.sql(
        f"""SELECT p_brand, p_partkey, p_size,
               CAST(round(p_retailprice * 100) AS BIGINT)
        FROM '{SF_DIR_ORACLE}/part.parquet'"""
    ).fetchall()
    by_brand: dict = {}
    for b, k, s, c in parts:
        by_brand.setdefault(b, []).append((k, s, c))
    want = set()
    for b, rows in by_brand.items():
        for k, s, c in rows:
            dominated = any(
                c2 <= c and s2 >= s and (c2 < c or s2 > s)
                for _, s2, c2 in rows
            )
            if not dominated:
                want.add((b, k))
    got = {
        (r.p_brand, r.p_partkey)
        for r in analytics_ext.skyline_parts(
            spark, SF_DIR_ORACLE
        ).collect()
    }
    assert got == want
    # the frontier must prune something, or the fixture is trivial
    assert 0 < len(got) < len(parts)
