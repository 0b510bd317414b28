"""Sequence analytics: oracle parity, pure-Python semantic twins
(the windowed lag really builds per-user sequences; the integer ACF
really is the textbook estimator), and the Cauchy–Schwarz bound."""

import math
from collections import Counter, defaultdict

import pytest

from bike_analyzer_spark.operators import sequences
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(sequences.QUERIES))
def test_vs_oracle(spark, duck, name):
    df = sequences.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, sequences.ORACLES[name], name=name)


def _events(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )


def test_transitions_match_pure_python(spark):
    """Counting (prev, next) over per-user (ts, event_id)-sorted
    sequences in plain Python gives the same matrix."""
    rows = _events(spark, SF_DIR_SMOKE)
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    pairs = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    got = sequences.event_transitions(spark, SF_DIR_SMOKE).collect()
    assert {(r.from_type, r.to_type): r.n_transitions for r in got} == dict(
        pairs
    )
    # each user contributes len(seq) - 1 transitions
    assert sum(pairs.values()) == len(rows) - len(by_user)
    # rows of the conditional-probability matrix sum to ~1
    by_from = defaultdict(float)
    for r in got:
        assert 0.0 <= r.p_next <= 1.0
        by_from[r.from_type] += r.p_next
    for s in by_from.values():
        assert math.isclose(s, 1.0, abs_tol=5e-4)


def _dense_series(spark, sf_dir):
    hours = Counter(
        r.h
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "CAST(ts AS TIMESTAMP) AS t"
        )
        .selectExpr(f"unix_micros(t) div {sequences.HOUR_US} AS h")
        .collect()
    )
    h0, h1 = min(hours), max(hours)
    return [hours.get(h, 0) for h in range(h0, h1 + 1)]


def test_acf_matches_pure_python(spark):
    """The multiply-through integer form equals the float textbook
    estimator sum((c_t-m)(c_{t-k}-m)) / sum((c_t-m)^2) on the dense
    zero-filled series."""
    c = _dense_series(spark, SF_DIR_SMOKE)
    n = len(c)
    m = sum(c) / n
    den = sum((x - m) ** 2 for x in c)
    got = sequences.activity_acf(spark, SF_DIR_SMOKE).collect()
    assert [r.lag_hours for r in got] == list(
        range(1, sequences.ACF_LAGS + 1)
    )
    for r in got:
        k = r.lag_hours
        num = sum(
            (c[t] - m) * (c[t - k] - m) for t in range(k, n)
        )
        assert r.n_hours == n
        assert math.isclose(r.acf, num / den, abs_tol=1e-9)


def test_acf_cauchy_schwarz_bound(spark):
    """|r_k| <= 1: the lag-k deviation products are bounded by the
    full-series sum of squares (each factor set is a subset)."""
    for r in sequences.activity_acf(spark, SF_DIR_ORACLE).collect():
        assert -1.0 - 1e-12 <= r.acf <= 1.0 + 1e-12


def test_acf_partition_invariance(spark):
    """Integer sums make the statistic partition-order invariant."""
    base = sequences.activity_acf(spark, SF_DIR_ORACLE).collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        other = sequences.activity_acf(spark, SF_DIR_ORACLE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert [tuple(r) for r in base] == [tuple(r) for r in other]


def test_anova_matches_pure_python(spark):
    """Float one-way ANOVA on the observed hourly series equals the
    quantized-integer decomposition to inside the micro-unit error,
    and eta^2 lands in [0, 1]."""
    from collections import defaultdict

    hs = Counter(
        r.h
        for r in spark.read.parquet(f"{SF_DIR_SMOKE}/events.parquet")
        .selectExpr("CAST(ts AS TIMESTAMP) AS t")
        .selectExpr(f"unix_micros(t) div {sequences.HOUR_US} AS h")
        .collect()
    )
    got = {
        r.period: r
        for r in sequences.activity_anova(spark, SF_DIR_SMOKE).collect()
    }
    assert set(got) == {"hour_of_day", "day_of_week"}
    for period, key in [
        ("hour_of_day", lambda h: h % 24),
        ("day_of_week", lambda h: (h // 24 + 4) % 7),
    ]:
        n = len(hs)
        mean = sum(hs.values()) / n
        ss_total = sum((c - mean) ** 2 for c in hs.values())
        groups = defaultdict(list)
        for h, c in hs.items():
            groups[key(h)].append(c)
        ss_between = sum(
            len(v) * (sum(v) / len(v) - mean) ** 2
            for v in groups.values()
        )
        r = got[period]
        assert r.n_obs == n
        assert r.n_groups == len(groups)
        assert math.isclose(r.ss_total, ss_total, rel_tol=1e-12)
        assert math.isclose(r.ss_between, ss_between, abs_tol=1e-4)
        assert math.isclose(
            r.eta_sq, ss_between / ss_total, abs_tol=1e-6
        )
        assert -1e-9 <= r.eta_sq <= 1 + 1e-9


def test_markov_eval_vs_oracle(spark, duck):
    assert_matches_oracle(
        sequences.markov_eval(spark, SF_DIR_ORACLE),
        duck,
        sequences.ORACLES["markov_eval"],
        name="markov_eval",
    )


def test_markov_eval_matches_scalar_replay(spark):
    """Train argmax on first-half transitions, score second-half, in
    plain Python over the raw event stream — per-type counts, the
    predicted class, and hits must match exactly."""
    from bike_analyzer_spark.sources.catalog import load

    rows = (
        load(spark, SF_DIR_ORACLE, "events")
        .selectExpr("user_id", "event_type", "unix_micros(ts) AS us",
                    "event_id")
        .collect()
    )
    mid = (min(r.us for r in rows) + max(r.us for r in rows)) // 2
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    train, test = Counter(), []
    for seq in by_user.values():
        seq.sort(key=lambda r: (r.us, r.event_id))
        for a, b in zip(seq, seq[1:]):
            if a.us <= mid:
                train[(a.event_type, b.event_type)] += 1
            else:
                test.append((a.event_type, b.event_type))
    pred = {}
    for (f, t), n in train.items():
        cur = pred.get(f)
        if cur is None or n > cur[0] or (n == cur[0] and t < cur[1]):
            pred[f] = (n, t)
    got = {
        r.from_type: r
        for r in sequences.markov_eval(spark, SF_DIR_ORACLE).collect()
    }
    n_train = Counter()
    for (f, _), n in train.items():
        n_train[f] += n
    for f, r in got.items():
        assert r.predicted_next == pred[f][1]
        assert r.n_train == n_train[f]
        want_test = [1 for (a, b) in test if a == f]
        want_hits = [1 for (a, b) in test if a == f and b == pred[f][1]]
        assert r.n_test == len(want_test)
        assert r.n_hits == len(want_hits)
        assert 0 <= r.hit_pct <= 100


def _dense_series_for(spark, sf_dir, event_type):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(f"event_type = '{event_type}'")
        .selectExpr("CAST(ts AS TIMESTAMP) AS t")
        .selectExpr(f"unix_micros(t) div {sequences.HOUR_US} AS h")
        .collect()
    )
    b = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("CAST(ts AS TIMESTAMP) AS t")
        .selectExpr(
            f"min(unix_micros(t) div {sequences.HOUR_US}) AS h0",
            f"max(unix_micros(t) div {sequences.HOUR_US}) AS h1",
        )
        .collect()[0]
    )
    hours = Counter(r.h for r in rows)
    return [hours.get(h, 0) for h in range(b.h0, b.h1 + 1)]


def test_ccf_matches_pure_python(spark):
    """The boundary-fold integer form equals the float textbook
    Pearson r of (x_t, y_{t+k}) over the lag-k overlap window of the
    dense zero-filled series pair."""
    x = _dense_series_for(spark, SF_DIR_SMOKE, sequences.CCF_X_TYPE)
    y = _dense_series_for(spark, SF_DIR_SMOKE, sequences.CCF_Y_TYPE)
    assert len(x) == len(y)
    n = len(x)
    got = sequences.activity_ccf(spark, SF_DIR_SMOKE).collect()
    assert [r.lag_hours for r in got] == list(
        range(0, sequences.CCF_LAGS + 1)
    )
    for r in got:
        k = r.lag_hours
        xs, ys = x[: n - k] if k else x, y[k:]
        nk = n - k
        assert r.n_pairs == nk
        assert r.dot == sum(a * b for a, b in zip(xs, ys))
        mx, my = sum(xs) / nk, sum(ys) / nk
        num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
        den = math.sqrt(
            sum((a - mx) ** 2 for a in xs)
            * sum((b - my) ** 2 for b in ys)
        )
        assert math.isclose(r.ccf, num / den, abs_tol=1e-9)
        assert -1.0 - 1e-12 <= r.ccf <= 1.0 + 1e-12
