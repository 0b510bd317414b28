import pytest
from bike_analyzer_spark.operators import asof
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

@pytest.mark.parametrize("name", sorted(asof.QUERIES))
def test_asof_vs_oracle(spark, duck, name):
    df = asof.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, asof.ORACLES[name], name=name)

def test_asof_small_right_no_shuffle_no_sort(spark):
    """The small-right as-of must not shuffle or sort the left side:
    only the broadcast of the 1-row array joins in."""
    df = asof.asof_hourly_stats(spark, SF_DIR_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # the single orderBy at the end is the query's own output sort;
    # the join itself is broadcast-nested-loop of a 1-row relation
    assert "BroadcastNestedLoopJoin" in plan, plan

def test_asof_backward_requires_keys(spark):
    import pytest as _pytest
    from bike_analyzer_spark.sources.catalog import load
    ev = load(spark, SF_DIR_ORACLE, "events")
    with _pytest.raises(ValueError):
        asof.asof_join_backward(ev, ev, "ts", ["value"])

def test_asof_backward_keyed_vs_duckdb(spark, duck):
    """Keyed union-window as-of vs DuckDB's native keyed ASOF JOIN."""
    from pyspark.sql import functions as F
    from bike_analyzer_spark.sources.catalog import load
    events = load(spark, SF_DIR_ORACLE, "events")
    hourly = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("user_views"))
        .select("user_id", (F.col("h") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
                "user_views")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    got = sorted(
        (r.event_id, r.user_views)
        for r in asof.asof_join_backward(
            purchases, hourly, "ts", ["user_views"], by=["user_id"]).collect()
    )
    want = sorted(map(tuple, duck.sql("""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) + INTERVAL 1 HOUR AS ts,
                   count(*) AS user_views
            FROM events WHERE event_type = 'view' GROUP BY 1, 2
        ), p AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id, hourly.user_views
        FROM p ASOF LEFT JOIN hourly
          ON p.user_id = hourly.user_id AND p.ts >= hourly.ts
    """).fetchall()))
    assert got == want

def test_session_window_exact_gap_boundary(spark):
    """Boundary pin (round-3 advice follow-up): Spark's native
    session_window MERGES an event landing exactly gap after the
    previous one (adjacent windows touch and coalesce), which matches
    the strictly-greater test in sessionize() and in BOTH session
    oracles — so `>` (not `>=`) is the correct oracle gap predicate.
    Verified empirically here so the question stays settled."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:30:00"),
         (2, "2024-01-01 00:00:00"), (2, "2024-01-01 00:30:00.000001")],
        "user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    native = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .groupBy("user_id").agg(F.count("*").alias("n_sessions"))
    )
    got = {r.user_id: r.n_sessions for r in native.collect()}
    assert got == {1: 1, 2: 2}  # exactly-gap merges; gap+1us splits
    wf = asof.sessionize(df.withColumn("event_id", F.lit(0)), "user_id", "ts", 30)
    wf_sessions = {
        r.user_id: r.n for r in
        wf.groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n")).collect()
    }
    assert wf_sessions == got  # the two machineries agree at the boundary


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
