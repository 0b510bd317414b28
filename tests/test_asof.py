import pytest
from bike_analyzer_spark.operators import asof
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

@pytest.mark.parametrize("name", sorted(asof.QUERIES))
def test_asof_vs_oracle(spark, duck, name):
    df = asof.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, asof.ORACLES[name], name=name)

def test_asof_single_shuffle(spark):
    """The union-marker as-of join must sort/shuffle once, never
    enumerate candidate pairs (no joins at all in the plan)."""
    df = asof.asof_hourly_stats(spark, SF_DIR_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan

def test_sessionize_synthetic(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 100, t0), (2, 100, t0 + dt.timedelta(minutes=10)),
        (3, 100, t0 + dt.timedelta(minutes=50)),   # 40min gap -> new
        (4, 200, t0),                              # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r.event_id: r.session_id
           for r in asof.sessionize(df, "user_id", "ts", 30).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}
