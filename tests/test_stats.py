"""Moment statistics: oracle parity, agreement with Spark's builtin
estimators, and the bit-stability claim the module exists for."""

import math

import pytest

from pyspark.sql import functions as F

from bike_analyzer_spark.operators import stats
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_stats_vs_oracle(spark, duck):
    df = stats.stats_moments(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, stats.ORACLES["stats_moments"], name="stats_moments"
    )


def test_matches_builtin_estimators(spark):
    """The exact-moment forms agree with Spark's double-accumulating
    builtins to float tolerance (they compute the same statistic;
    only the accumulation differs)."""
    got = {
        r["event_type"]: r
        for r in stats.stats_moments(spark, SF_DIR_ORACLE).collect()
    }
    ref = (
        load(spark, SF_DIR_ORACLE, "events")
        .select(
            "event_type",
            (F.round(F.col("value") * 100, 0) / 100).alias("v"),
            F.hour("ts").cast("double").alias("h"),
        )
        .groupBy("event_type")
        .agg(
            F.stddev_samp("v").alias("sd"),
            F.corr("v", "h").alias("c"),
            F.regr_slope("v", "h").alias("m"),
            F.regr_intercept("v", "h").alias("b"),
        )
        .collect()
    )
    assert got
    for r in ref:
        g = got[r["event_type"]]
        assert math.isclose(g["stddev_samp_v"], r["sd"], rel_tol=1e-9)
        assert math.isclose(g["corr_vh"], r["c"], rel_tol=1e-6)
        assert math.isclose(g["slope_vh"], r["m"], rel_tol=1e-6)
        assert math.isclose(g["intercept_vh"], r["b"], rel_tol=1e-6)


def test_partition_invariance(spark):
    """Integer power sums make the result bit-identical across
    physical layouts — the property the builtins lack."""
    base = stats.stats_moments(spark, SF_DIR_ORACLE).collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        other = stats.stats_moments(spark, SF_DIR_ORACLE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert sorted(map(tuple, base)) == sorted(map(tuple, other))


def test_robust_outliers_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators.stats import (
        ORACLES,
        robust_outliers,
    )

    assert_matches_oracle(
        robust_outliers(spark, SF_DIR_ORACLE),
        duck,
        ORACLES["robust_outliers"],
        name="robust_outliers",
    )


def test_robust_outliers_matches_pure_python(spark):
    """statistics.median over the raw cents lists + a literal float
    MAD-rule scan reproduce median/MAD/outlier counts exactly (the
    integer comparison has no boundary error: 1.4826 is rational)."""
    import statistics
    from collections import defaultdict
    from fractions import Fraction

    from bike_analyzer_spark.operators import stats as st

    vals = defaultdict(list)
    for r in (
        spark.read.parquet(f"{SF_DIR_ORACLE}/events.parquet")
        .selectExpr(
            "event_type", "CAST(round(value * 100) AS BIGINT) AS v"
        )
        .collect()
    ):
        vals[r.event_type].append(r.v)
    got = {
        r.event_type: r
        for r in st.robust_outliers(spark, SF_DIR_ORACLE).collect()
    }
    assert set(got) == set(vals)
    for t, vs in vals.items():
        med = Fraction(statistics.median(vs))  # exact for int input
        devs = [abs(Fraction(v) - med) for v in vs]
        mad = Fraction(statistics.median(sorted(devs)))
        cut = (
            st.ROBUST_K
            * Fraction(st.MAD_SIGMA_N, st.MAD_SIGMA_D)
            * mad
        )
        n_out = sum(1 for d in devs if d > cut)
        r = got[t]
        assert r.n == len(vs)
        assert r.median_value == float(med) / 100
        assert r.mad_value == float(mad) / 100
        assert r.n_outliers == n_out


def test_benford_digits_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators import stats

    assert_matches_oracle(
        stats.benford_digits(spark, SF_DIR_ORACLE),
        duck,
        stats.ORACLES["benford_digits"],
        name="benford_digits",
    )


def test_benford_digits_identities(spark):
    import math

    import duckdb as dk

    from bike_analyzer_spark.operators import stats

    rows = stats.benford_digits(spark, SF_DIR_ORACLE).collect()
    n_pos = dk.sql(
        f"""SELECT count(*) FROM '{SF_DIR_ORACLE}/events.parquet'
        WHERE event_type = 'purchase'
          AND CAST(round(value * 100) AS BIGINT) > 0"""
    ).fetchone()[0]
    assert sum(r.n_d for r in rows) == n_pos
    assert [r.digit for r in rows] == sorted({r.digit for r in rows})
    assert {r.digit for r in rows} <= set(range(1, 10))
    # Benford expectations sum to 100% and match log10(1 + 1/d)
    assert sum(
        math.log10(1 + 1 / d) * 100 for d in range(1, 10)
    ) == pytest.approx(100.0, abs=1e-9)
    n = sum(r.n_d for r in rows)
    for r in rows:
        p = math.log10(1 + 1 / r.digit)
        assert r.benford_pct == pytest.approx(p * 100, rel=1e-12)
        want_z = (r.n_d - n * p) / math.sqrt(n * p * (1 - p))
        assert r.z_resid == pytest.approx(want_z, rel=1e-12)
        assert abs(r.observed_pct - 100 * r.n_d / n) <= 5e-4


def test_winsorized_vs_oracle(spark, duck):
    df = stats.winsorized_stats(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, stats.ORACLES["winsorized_stats"], name="winsorized_stats"
    )


def test_winsorized_matches_scalar_replay(spark):
    """Per type: clamp to the ceil-rank p5/p95 cents cuts computed in
    plain Python over the raw values, then mean — must equal the
    engine's histogram-path output exactly."""
    raw = (
        load(spark, SF_DIR_ORACLE, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    )
    by_type = {}
    for r in raw:
        by_type.setdefault(r.event_type, []).append(round(r.value * 100))
    got = {
        r.event_type: r
        for r in stats.winsorized_stats(spark, SF_DIR_ORACLE).collect()
    }
    assert set(got) == set(by_type)
    p = stats.WINSOR_PCT
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        lo = vals[(p * n + 99) // 100 - 1]
        hi = vals[((100 - p) * n + 99) // 100 - 1]
        assert got[t].n == n
        assert got[t].lo_cut == lo / 100
        assert got[t].hi_cut == hi / 100
        wsum = sum(min(max(v, lo), hi) for v in vals)
        # the halfup_ratio_wide recurrence, scalar-side
        den = 100 * n
        expected = ((wsum * 2 * 10**4 + den) // (2 * den)) / 10**4
        assert got[t].winsorized_mean == expected
        # clamping bounds: winsorized mean sits inside the cuts
        assert got[t].lo_cut <= got[t].winsorized_mean <= got[t].hi_cut


def test_theilsen_matches_pure_python(spark):
    """Replay the estimator in plain Python: quantized pairwise
    slopes, the lower-median order statistic, and the OLS slope."""
    import statistics
    from collections import defaultdict

    from bike_analyzer_spark.operators import stats as _stats
    from tests.conftest import SF_DIR_ORACLE as _SF

    daily = defaultdict(int)
    for r in (
        spark.read.parquet(f"{_SF}/events.parquet")
        .where("event_type = 'purchase'")
        .selectExpr("CAST(ts AS DATE) AS day", "value")
        .collect()
    ):
        daily[r.day] += round(r.value * 100)
    d0 = min(daily)
    pts = sorted(((d - d0).days, y) for d, y in daily.items())
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx, dy = pts[j][0] - pts[i][0], pts[j][1] - pts[i][1]
            sign = -1 if dy < 0 else 1
            s_m = sign * ((abs(dy) * 2000 + dx) // (2 * dx))
            slopes.append((s_m, pts[i][0], pts[j][0]))
    slopes.sort()
    p = len(slopes)
    med = slopes[(p + 1) // 2 - 1][0]
    [r] = _stats.theilsen_trend(spark, _SF).collect()
    assert (r.n_days, r.n_pairs, r.ts_slope_mcents) == (
        len(pts), p, med,
    )
    assert r.ts_slope == med / 100000
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    import math
    assert math.isclose(
        r.ols_slope,
        (n * sxy - sx * sy) / ((n * sxx - sx * sx) * 100),
        rel_tol=1e-12,
    )
    # the robust estimate must sit inside the slope range
    assert slopes[0][0] <= r.ts_slope_mcents <= slopes[-1][0]
    del statistics
