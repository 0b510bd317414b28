"""Property-based sessionization check against a scalar reference:
hypothesis drives the gap structure (bursts, exact-threshold gaps,
duplicate timestamps, single-event keys) that the fixture data only
samples. The reference is a 10-line Python loop — a third independent
implementation next to the DuckDB window oracle and Spark's native
session_window (both already cross-checked in tests/test_asof.py)."""

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bike_analyzer_spark.operators.asof import sessionize

GAP_MIN = 2
GAP_US = GAP_MIN * 60 * 1_000_000

KEYS = st.integers(min_value=0, max_value=2)
# timestamps in µs, clustered so some gaps straddle the threshold;
# includes exact-threshold (== GAP_US, must NOT split) and
# one-past (must split)
TS_US = st.one_of(
    st.integers(min_value=0, max_value=5 * GAP_US),
    st.sampled_from([0, GAP_US, GAP_US + 1, 2 * GAP_US, 2 * GAP_US + 1]),
)


def _reference(rows):
    """rows: [(key, ts_us, event_id)] -> {event_id: session_id}."""
    by_key = defaultdict(list)
    for k, t, e in rows:
        by_key[k].append((t, e))
    out = {}
    for k, evs in by_key.items():
        evs.sort()
        sid, prev = 0, None
        for t, e in evs:
            if prev is None or t - prev > GAP_US:
                sid += 1
            out[e] = sid
            prev = t
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.tuples(KEYS, TS_US), min_size=1, max_size=15))
def test_sessionize_matches_scalar_reference(spark, rows):
    data = [(k, t, i) for i, (k, t) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "user_id int, ts_us long, event_id int"
    ).selectExpr("user_id", "timestamp_micros(ts_us) AS ts", "event_id")
    got = {
        r.event_id: r.session_id
        for r in sessionize(df, "user_id", "ts", GAP_MIN).collect()
    }
    assert got == _reference(data)
