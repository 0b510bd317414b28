import pytest
from bike_analyzer_spark.operators import analytics_ext
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

@pytest.mark.parametrize("name", sorted(analytics_ext.QUERIES))
def test_analytics_ext_vs_oracle(spark, duck, name):
    df = analytics_ext.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, analytics_ext.ORACLES[name], name=name)


def test_value_reversals_match_pure_python(spark):
    """Scan each user's sorted cents series in plain Python: strict
    local extrema and longest monotone runs."""
    from collections import defaultdict

    from tests.conftest import SF_DIR_ORACLE

    rows = (
        spark.read.parquet(f"{SF_DIR_ORACLE}/events.parquet")
        .selectExpr(
            "user_id",
            "CAST(ts AS TIMESTAMP) AS ts",
            "event_id",
            "CAST(round(value * 100) AS BIGINT) AS v",
        )
        .collect()
    )
    series = defaultdict(list)
    for r in rows:
        series[r.user_id].append((r.ts, r.event_id, r.v))
    want = {}
    for u, seq in series.items():
        seq.sort()
        vs = [v for _, _, v in seq]
        dirs = [None] + [
            (0 if b == a else (1 if b > a else -1))
            for a, b in zip(vs, vs[1:])
        ]
        valleys = peaks = 0
        for i in range(1, len(dirs) - 1):
            if dirs[i] == -1 and dirs[i + 1] == 1:
                valleys += 1
            if dirs[i] == 1 and dirs[i + 1] == -1:
                peaks += 1
        runs = {-1: 0, 1: 0}
        cur_d, cur_len = 0, 0
        for d in dirs[1:]:
            if d in (-1, 1) and d == cur_d:
                cur_len += 1
            elif d in (-1, 1):
                cur_d, cur_len = d, 1
            else:
                cur_d, cur_len = 0, 0
            if cur_d:
                runs[cur_d] = max(runs[cur_d], cur_len)
        want[u] = (len(vs), valleys, peaks, runs[-1], runs[1])
    got = {
        r.user_id: (
            r.n_points,
            r.n_valleys,
            r.n_peaks,
            r.max_down_run,
            r.max_up_run,
        )
        for r in analytics_ext.value_reversals(
            spark, SF_DIR_ORACLE
        ).collect()
    }
    assert got == want
