"""Seasonal anomaly detection: oracle parity plus a from-scratch
python replay of the trend/seasonal/residual decomposition."""

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from bike_analyzer_spark.operators import drift
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_seasonal_anomalies_vs_oracle(spark, duck):
    assert_matches_oracle(
        drift.seasonal_anomalies(spark, SF_DIR_ORACLE),
        duck,
        drift.ORACLES["seasonal_anomalies"],
        name="seasonal_anomalies",
    )


def _shu(n: int, d: int) -> int:
    sign = -1 if n < 0 else 1
    return sign * ((abs(n) * 2 + d) // (d * 2))


def test_seasonal_matches_python_decomposition(spark):
    counts = Counter(
        h
        for (h,) in duckdb.sql(
            f"""SELECT epoch_us(CAST(ts AS TIMESTAMP)) // {drift.HOUR_US}
            FROM '{SF_DIR_ORACLE}/events.parquet'"""
        ).fetchall()
    )
    hs = sorted(counts)
    trend = {}
    for h in hs:
        wnd = [
            counts[x]
            for x in hs
            if h - drift.TREND_HALF <= x <= h + drift.TREND_HALF
        ]
        trend[h] = _shu(1000 * sum(wnd), len(wnd))
    d_m = {h: 1000 * counts[h] - trend[h] for h in hs}
    by_how = defaultdict(list)
    for h in hs:
        by_how[h % drift.SEASON_HOURS].append(d_m[h])
    season = {
        how: _shu(sum(v), len(v)) for how, v in by_how.items()
    }
    resid = {
        h: d_m[h] - season[h % drift.SEASON_HOURS] for h in hs
    }
    n = len(hs)
    sr = sum(resid.values())
    srr = sum(v * v for v in resid.values())
    sigma = math.sqrt(srr / n - (sr / n) ** 2)
    want = sorted(
        ((abs(v), h) for h, v in resid.items()),
        key=lambda x: (-x[0], x[1]),
    )[: drift.ANOM_TOP]
    got = drift.seasonal_anomalies(spark, SF_DIR_ORACLE).collect()
    assert len(got) == len(want)
    for r, (_, h) in zip(got, want):
        hour = int(r.hour_ts.timestamp() * 1e6) // drift.HOUR_US
        assert hour == h
        assert r.n_events == counts[h]
        assert r.trend == trend[h] / 1000
        assert r.seasonal == season[h % drift.SEASON_HOURS] / 1000
        assert r.residual == resid[h] / 1000
        assert r.z == pytest.approx(resid[h] / sigma, rel=1e-12)
    # residual must be exactly count - trend - seasonal (per milli)
    for r in got:
        assert round(
            (r.n_events - r.trend - r.seasonal - r.residual) * 1000
        ) == 0
