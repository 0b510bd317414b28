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
