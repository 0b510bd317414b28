"""Drift diagnostics: oracle parity, pure-Python twins (the integer
CUSUM really finds the dense-series argmax; the ratio-trick PSI
really is the textbook sum), and PSI's nonnegativity."""

import math
from collections import Counter

import pytest

from bike_analyzer_spark.operators import drift
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(drift.QUERIES))
def test_vs_oracle(spark, duck, name):
    df = drift.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, drift.ORACLES[name], name=name)


def _hours(spark, sf_dir):
    return [
        r.h
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("CAST(ts AS TIMESTAMP) AS t")
        .selectExpr(f"unix_micros(t) div {drift.HOUR_US} AS h")
        .collect()
    ]


def test_cusum_matches_dense_python(spark):
    """Brute-force: materialize the dense zero-filled series, scan
    every prefix, take the max |S_t| (earliest tie) — must equal the
    gap-endpoint candidate formulation."""
    hs = _hours(spark, SF_DIR_SMOKE)
    cnt = Counter(hs)
    h0, h1 = min(cnt), max(cnt)
    c = [cnt.get(h, 0) for h in range(h0, h1 + 1)]
    n, s = len(c), sum(c)
    best = None  # (-(|n*S_t|), pos)
    p = 0
    for pos in range(1, n + 1):
        p += c[pos - 1]
        ns = n * p - pos * s
        key = (-abs(ns), pos)
        if best is None or key < best[0]:
            best = (key, pos, ns, p)
    _, pos, ns, p = best
    row = drift.cusum_changepoint(spark, SF_DIR_SMOKE).collect()[0]
    assert row.change_pos == pos
    assert row.n_hours == n
    assert math.isclose(row.cusum, ns / n, abs_tol=1e-9)
    assert math.isclose(row.mean_rate_before, p / pos, abs_tol=1e-4)
    if n > pos:
        assert math.isclose(
            row.mean_rate_after, (s - p) / (n - pos), abs_tol=1e-4
        )


def test_psi_matches_pure_python(spark):
    """Textbook float PSI over the same midpoint split agrees to
    well inside the micro-nat quantization."""
    rows = (
        spark.read.parquet(f"{SF_DIR_SMOKE}/events.parquet")
        .selectExpr("event_type", "CAST(ts AS TIMESTAMP) AS t")
        .selectExpr(
            "event_type", f"unix_micros(t) div {drift.HOUR_US} AS h"
        )
        .collect()
    )
    hs = [r.h for r in rows]
    mid = (min(hs) + max(hs) - 1) // 2
    first = Counter(r.event_type for r in rows if r.h <= mid)
    second = Counter(r.event_type for r in rows if r.h > mid)
    keys = set(first) & set(second)
    t1 = sum(first[k] for k in keys)
    t2 = sum(second[k] for k in keys)
    got = {
        r.event_type: r
        for r in drift.psi_drift(spark, SF_DIR_SMOKE).collect()
    }
    assert set(got) == keys | {"(all)"}
    total = 0.0
    for k in keys:
        p, q = first[k] / t1, second[k] / t2
        want = (p - q) * math.log(p / q)
        assert want >= 0
        assert got[k].n_first == first[k]
        assert got[k].n_second == second[k]
        assert math.isclose(got[k].psi_contrib, want, abs_tol=1e-5)
        assert got[k].psi_contrib >= 0
        total += want
    assert math.isclose(got["(all)"].psi_contrib, total, abs_tol=1e-4)
    assert got["(all)"].n_first == t1
    assert got["(all)"].n_second == t2


def test_psi_total_is_sum_of_parts(spark):
    rows = drift.psi_drift(spark, SF_DIR_ORACLE).collect()
    parts = [r.psi_contrib for r in rows if r.event_type != "(all)"]
    tot = [r.psi_contrib for r in rows if r.event_type == "(all)"]
    assert len(tot) == 1
    assert math.isclose(tot[0], sum(parts), abs_tol=1e-9)
    assert all(p >= 0 for p in parts)


def test_seasonal_circular_python_replay(spark):
    """Full python recount of the circular resultant at sf0.01 (same
    epoch-hour mod 168, same quantized constants, same ppm
    division), plus the analytic bounds: R^2 in [0, 1e6] and near 0
    for this near-uniform synthetic cadence."""
    import math
    from collections import Counter

    from bike_analyzer_spark.operators.drift import (
        CIRC_QUANT,
        HOUR_US,
        SEASON_HOW,
        _circ_consts,
        seasonal_circular,
    )
    from bike_analyzer_spark.sources.catalog import load
    from tests.conftest import SF_DIR_ORACLE

    consts = {k: (c, s) for k, c, s in _circ_consts()}
    # python recount from the raw rows
    rows = (
        load(spark, SF_DIR_ORACLE, "events")
        .select("event_type", "ts")
        .collect()
    )
    hist: dict[str, Counter] = {}
    for r in rows:
        if r.ts is None:
            continue
        # exact integer micros from the naive UTC timestamp
        import calendar

        us = (
            calendar.timegm(r.ts.timetuple()) * 1_000_000
            + r.ts.microsecond
        )
        how = (us // HOUR_US) % SEASON_HOW
        hist.setdefault(r.event_type, Counter())[how] += 1
    got = {
        r.event_type: r for r in seasonal_circular(spark, SF_DIR_ORACLE).collect()
    }
    assert set(got) == set(hist)
    for et, cnt in hist.items():
        n = sum(cnt.values())
        sx = sum(c * consts[k][0] for k, c in cnt.items())
        sy = sum(c * consts[k][1] for k, c in cnt.items())
        r2 = ((sx * sx + sy * sy) * 1_000_000) // (
            n * n * CIRC_QUANT * CIRC_QUANT
        )
        peak = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        g = got[et]
        assert (g.n, g.sx, g.sy, g.r2_ppm) == (n, sx, sy, r2)
        assert (g.peak_how, g.peak_count) == peak
        assert 0 <= g.r2_ppm <= 1_000_000
        assert g.r2_ppm < 50_000  # near-uniform synthetic cadence
    # concentration sanity: all events in ONE hour-of-week -> R^2 ~ 1
    import datetime

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    one = spark.createDataFrame(
        [(i, base, 7, "burst", 1.0, "{}") for i in range(50)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        one.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = seasonal_circular(spark, td).collect()
    assert len(out) == 1
    assert out[0].r2_ppm >= 990_000
