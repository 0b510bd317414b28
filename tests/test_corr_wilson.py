"""Metric correlations and the Wilson-interval conversion trend:
python recounts of both (numpy corrcoef on the dense grid; scipy-free
Wilson closed form)."""

import math
from collections import Counter

import duckdb
import numpy as np
import pytest

from bike_analyzer_spark.operators import stats, useranalytics
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

HOUR_US = 3_600_000_000


def test_metric_correlations_vs_oracle(spark, duck):
    assert_matches_oracle(
        stats.metric_correlations(spark, SF_DIR_ORACLE),
        duck,
        stats.ORACLES["metric_correlations"],
        name="metric_correlations",
    )


def test_metric_correlations_match_numpy(spark):
    cells = Counter()
    for h, t in duckdb.sql(
        f"""SELECT epoch_us(CAST(ts AS TIMESTAMP)) // {HOUR_US},
               event_type
        FROM '{SF_DIR_ORACLE}/events.parquet'"""
    ).fetchall():
        cells[(h, t)] += 1
    hours = range(
        min(h for h, _ in cells), max(h for h, _ in cells) + 1
    )
    types = sorted({t for _, t in cells})
    series = {
        t: np.array([cells.get((h, t), 0) for h in hours], dtype=float)
        for t in types
    }
    rows = stats.metric_correlations(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        assert r.n == len(list(hours))
        want = np.corrcoef(series[r.t1], series[r.t2])[0, 1]
        assert r.corr == pytest.approx(want, abs=1e-12)
    # the dense grid matters: at least one pair must have a genuine
    # (non-unit, non-nan) correlation
    assert any(r.corr is not None and abs(r.corr) < 1 for r in rows)


def test_weekly_conversion_ci_vs_oracle(spark, duck):
    assert_matches_oracle(
        useranalytics.weekly_conversion_ci(spark, SF_DIR_ORACLE),
        duck,
        useranalytics.ORACLES["weekly_conversion_ci"],
        name="weekly_conversion_ci",
    )


def test_wilson_interval_properties(spark):
    rows = useranalytics.weekly_conversion_ci(
        spark, SF_DIR_ORACLE
    ).collect()
    z = float(useranalytics.WILSON_Z)
    for r in rows:
        p = r.k / r.n
        center = (p + z * z / (2 * r.n)) / (1 + z * z / r.n)
        half = (
            z
            * math.sqrt(
                p * (1 - p) / r.n + z * z / (4 * r.n * r.n)
            )
            / (1 + z * z / r.n)
        )
        assert r.wilson_lo == pytest.approx(center - half, rel=1e-12)
        assert r.wilson_hi == pytest.approx(center + half, rel=1e-12)
        # the score interval is always inside [0, 1] and brackets p
        assert 0 <= r.wilson_lo <= p <= r.wilson_hi <= 1
        assert abs(r.conversion_pct - 100 * p) <= 5e-3
