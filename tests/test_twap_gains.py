"""TWAP and NB gains-table correctness beyond the oracle gate:
python integration replay for the time-weighted average, and the
gains table's internal identities (band partition of the corpus,
cumulative monotonicity, lift-vs-gain consistency)."""

from collections import defaultdict

import duckdb
import pytest

from bike_analyzer_spark.operators import evalsuite, hypertable
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_time_weighted_avg_vs_oracle(spark, duck):
    assert_matches_oracle(
        hypertable.time_weighted_avg(spark, SF_DIR_ORACLE),
        duck,
        hypertable.ORACLES["time_weighted_avg"],
        name="time_weighted_avg",
    )


def test_twap_matches_python_integration(spark):
    series = defaultdict(list)
    for et, d, v, us in duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE),
               CAST(round(value * 100) AS BIGINT),
               epoch_us(CAST(ts AS TIMESTAMP))
        FROM '{SF_DIR_ORACLE}/events.parquet'"""
    ).fetchall():
        series[(et, d)].append((us, v))
    rows = hypertable.time_weighted_avg(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == len(series)
    for r in rows:
        pts = sorted(series[(r.event_type, r.day)])
        assert r.n_obs == len(pts)
        dur = pts[-1][0] - pts[0][0]
        assert r.dur_us == dur
        if dur == 0:
            assert r.twap_value is None
            continue
        num = sum(
            v * (pts[i + 1][0] - us)
            for i, (us, v) in enumerate(pts[:-1])
        )
        assert r.twap_value == pytest.approx(
            num / (dur * 100), abs=5e-5
        )
        # LOCF average must sit inside the value envelope
        vals = [v / 100 for _, v in pts[:-1]]
        assert min(vals) - 1e-9 <= r.twap_value <= max(vals) + 1e-9


def test_nbq_gains_vs_oracle(spark, duck):
    assert_matches_oracle(
        evalsuite.nbq_gains(spark, SF_DIR_ORACLE),
        duck,
        evalsuite.ORACLES["nbq_gains"],
        name="nbq_gains",
    )


def test_nbq_gains_identities(spark):
    from bike_analyzer_spark.operators import classifier

    rows = sorted(
        evalsuite.nbq_gains(spark, SF_DIR_ORACLE).collect(),
        key=lambda r: -r.band_lo,
    )
    sel = classifier.nbq_select(spark, SF_DIR_ORACLE).collect()
    # bands partition the scored corpus exactly
    assert sum(r.n_docs for r in rows) == len(sel)
    assert sum(r.n_pos for r in rows) == sum(x.keep_rule for x in sel)
    assert all(
        evalsuite.GAINS_LO <= r.band_lo < evalsuite.GAINS_HI
        for r in rows
    )
    # cumulative gain climbs to exactly 100%
    assert rows[-1].cum_gain_pct == 100.0
    gains = [r.cum_gain_pct for r in rows]
    assert gains == sorted(gains)
    # pos_rate within each band is a genuine rate
    for r in rows:
        assert 0 <= r.n_pos <= r.n_docs
        assert abs(r.pos_rate_pct - 100 * r.n_pos / r.n_docs) <= 5e-3
    # the bottom row's lift is the base rate against itself: 1
    assert rows[-1].cum_lift == 1.0
