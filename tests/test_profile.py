import pytest
from bike_analyzer_spark.operators import profile as prof
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

def test_profile_events_vs_oracle(spark, duck):
    df = prof.QUERIES["profile_events"](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, prof.ORACLES["profile_events"],
                          name="profile_events")

def test_profile_single_pass(spark):
    """One scan of the profiled table, regardless of column count."""
    from bike_analyzer_spark.sources.catalog import load
    df = prof.profile(load(spark, SF_DIR_ORACLE, "events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan

def test_profile_null_handling(spark):
    rows = [(1, None), (2, "x"), (None, "y")]
    df = spark.createDataFrame(rows, "a int, b string")
    got = {r.col_name: (r.n_nonnull, r.null_rate, r.min_value, r.max_value)
           for r in prof.profile(df).collect()}
    assert got["a"] == (2, 0.3333, 1.0, 2.0)
    assert got["b"][0] == 2 and got["b"][2] is None
