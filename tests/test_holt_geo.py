"""Holt smoothing and geo hotspots beyond the oracle gate: a pure
Python replay of the exact-integer Holt recurrence, and the Gi*
statistic recomputed from an independent cell rebuild."""

import math

import duckdb
import pytest

from bike_analyzer_spark.operators import od, sequences
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_holt_forecast_vs_oracle(spark, duck):
    assert_matches_oracle(
        sequences.holt_forecast(spark, SF_DIR_ORACLE),
        duck,
        sequences.ORACLES["holt_forecast"],
        name="holt_forecast",
    )


def _fdiv(a: int, d: int) -> int:
    return (a - (((a % d) + d) % d)) // d  # == floor div for d > 0


def test_holt_matches_python_replay(spark):
    daily = sorted(
        duckdb.sql(
            f"""SELECT CAST(ts AS DATE),
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT)
            FROM '{SF_DIR_ORACLE}/events.parquet'
            WHERE event_type = 'purchase' GROUP BY 1"""
        ).fetchall()
    )
    K, A, B = sequences.HOLT_K, sequences.ALPHA_D, sequences.BETA_D
    want = []
    l = b = None
    for day, y in daily:
        if l is None:
            l, b = y * K, 0
        else:
            l_new = _fdiv(y * K + (A - 1) * (l + b), A)
            b = _fdiv(l_new - l + (B - 1) * b, B)
            l = l_new
        want.append((day, y, l, b))
    got = sequences.holt_forecast(spark, SF_DIR_ORACLE).collect()
    assert len(got) == len(want)
    for r, (day, y, l, b) in zip(got, want):
        assert r.day == day
        assert r.revenue == y / 100
        assert r.level == l / (K * 100)
        assert r.trend == b / (K * 100)
        assert r.fitted_next == (l + b) / (K * 100)
    # the fixture series must bend somewhere, or beta is untested
    assert any(b != 0 for _, _, _, b in want)


def test_geo_hotspots_vs_oracle(spark, duck):
    assert_matches_oracle(
        od.geo_hotspots(spark, SF_DIR_ORACLE),
        duck,
        od.ORACLES["geo_hotspots"],
        name="geo_hotspots",
    )


def test_geo_hotspots_gi_identities(spark):
    rows = od.geo_hotspots(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == od.GEO_TOP
    # rebuild the full cell grid independently from the flow query
    flows = od.infer_flows(spark, SF_DIR_ORACLE, minutes=10).collect()
    act: dict = {}
    for r in flows:
        if r.o == r.d:
            continue
        act[r.o] = act.get(r.o, 0) + r.flow
        act[r.d] = act.get(r.d, 0) + r.flow
    cells: dict = {}
    for k, a in act.items():
        key = (k % 100, (k * 7) % 100)
        cells[key] = cells.get(key, 0) + a
    n = len(cells)
    t = sum(cells.values())
    q = sum(v * v for v in cells.values())
    xbar = t / n
    s = math.sqrt(q / n - xbar * xbar)
    zs = [r.gi_z for r in rows]
    assert zs == sorted(zs, reverse=True)
    for r in rows:
        nb = [
            cells.get((r.i + di, r.j + dj))
            for di in (-1, 0, 1)
            for dj in (-1, 0, 1)
        ]
        gi = sum(v for v in nb if v is not None)
        wi = sum(1 for v in nb if v is not None)
        assert (r.neighborhood_activity, r.n_neighbor_cells) == (gi, wi)
        want = (gi - xbar * wi) / (
            s * math.sqrt((n * wi - wi * wi) / (n - 1))
        )
        assert r.gi_z == pytest.approx(want, rel=1e-12)
    # a hotspot must actually exceed expectation
    assert rows[0].gi_z > 0
