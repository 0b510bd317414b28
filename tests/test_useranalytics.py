"""Cohort-retention correctness: oracle parity plus the triangle
identities (offset-0 row is the cohort itself at 100%; retained
users never exceed cohort size; triangle is span-bounded)."""

from bike_analyzer_spark.operators import useranalytics
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_cohort_retention_vs_oracle(spark, duck):
    df = useranalytics.cohort_retention(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, useranalytics.ORACLES["cohort_retention"],
        name="cohort_retention",
    )


def test_triangle_identities(spark):
    rows = useranalytics.cohort_retention(spark, SF_DIR_ORACLE).collect()
    assert rows
    cohorts: dict = {}
    for r in rows:
        cohorts.setdefault(r["cohort_week"], []).append(r)
    for series in cohorts.values():
        base = next(r for r in series if r["week_offset"] == 0)
        assert base["n_users"] == base["cohort_size"]
        assert base["retention_pct"] == 100.0
        for r in series:
            assert 0 < r["n_users"] <= r["cohort_size"]
            assert r["cohort_size"] == base["cohort_size"]
    # retention must actually decay somewhere, or the fixture is
    # degenerate and the percentage math is untested
    assert any(
        r["week_offset"] > 0 and r["n_users"] < r["cohort_size"]
        for r in rows
    )
