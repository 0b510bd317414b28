"""Smoke tests for the driver contract surface."""

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_queries_and_oracles_aligned(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must have a query; queries without oracle are
    # allowed (rows-only check) but flagged here for visibility
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys without queries(): {missing}"
