"""Chi-square A/B harness: oracle parity, contingency-table
identities against an independent per-user recount, and the
closed-form 2x2 statistic recomputed in pure Python."""

import duckdb
import pytest

from bike_analyzer_spark.operators import experiment
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_ab_test_chi2_vs_oracle(spark, duck):
    assert_matches_oracle(
        experiment.ab_test_chi2(spark, SF_DIR_ORACLE),
        duck,
        experiment.ORACLES["ab_test_chi2"],
        name="ab_test_chi2",
    )


@pytest.fixture(scope="module")
def row(spark):
    rows = experiment.ab_test_chi2(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 1
    return rows[0]


def test_cells_match_independent_recount(row):
    """Rebuild the contingency table in DuckDB from scratch (same
    salt, independent SQL) and compare every cell."""
    con = duckdb.connect()
    n, a, b, c, d = con.sql(
        f"""
        WITH spend AS (
            SELECT CAST(('0x' || substr(md5(
                       '{experiment.EXP_SALT}' || ':'
                       || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 2 AS arm,
                   coalesce(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT) END),
                       0) AS s
            FROM '{SF_DIR_ORACLE}/events.parquet'
            GROUP BY user_id
        ), t AS (
            SELECT count(*) AS n, sum(s) AS tot FROM spend
        )
        SELECT max(n),
               sum(CASE WHEN arm = 0 AND s * n > tot THEN 1 ELSE 0 END),
               sum(CASE WHEN arm = 0 AND s * n <= tot THEN 1 ELSE 0 END),
               sum(CASE WHEN arm = 1 AND s * n > tot THEN 1 ELSE 0 END),
               sum(CASE WHEN arm = 1 AND s * n <= tot THEN 1 ELSE 0 END)
        FROM spend, t
        """
    ).fetchone()
    assert (row.n_users, row.a, row.b, row.c, row.d) == (n, a, b, c, d)


def test_chi2_closed_form_and_verdict(row):
    n, a, b, c, d = row.n_users, row.a, row.b, row.c, row.d
    assert a + b + c + d == n
    # both arms populated, both outcomes observed (non-degenerate
    # fixture — otherwise the statistic's guards are untested)
    assert min(a + b, c + d, a + c, b + d) > 0
    want = (
        float(n)
        * (float(a) * float(d) - float(b) * float(c)) ** 2
        / (
            float(a + b)
            * float(c + d)
            * float(a + c)
            * float(b + d)
        )
    )
    assert row.chi2 == pytest.approx(want, rel=1e-12)
    assert row.significant == (
        row.chi2 > float(experiment.CHI2_CRIT_95)
    )
    assert abs(row.rate_arm0 - a / (a + b)) <= 5e-7
    assert abs(row.rate_arm1 - c / (c + d)) <= 5e-7


def test_ab_cuped_vs_oracle(spark, duck):
    assert_matches_oracle(
        experiment.ab_cuped_readout(spark, SF_DIR_ORACLE),
        duck,
        experiment.ORACLES["ab_cuped_readout"],
        name="ab_cuped_readout",
    )


def test_cuped_python_replay(spark, duck):
    """Full python recompute: pre/post split at the epoch-micros
    midpoint, pooled theta = cov/var from exact integer cents, and
    the per-arm adjusted means; also the CUPED invariant that the
    pooled mean of the adjustment term is zero (the adjusted GRAND
    mean equals the raw grand mean up to float error)."""
    rows = experiment.ab_cuped_readout(spark, SF_DIR_ORACLE).collect()
    assert [r.arm for r in rows] == [0, 1]
    raw = duck.sql(
        """
        WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                       AS mid_us FROM events)
        SELECT user_id,
               coalesce(sum(CASE WHEN event_type = 'purchase'
                    AND epoch_us(ts) <= mid_us
                    THEN CAST(round(value*100) AS BIGINT) END), 0) AS x,
               coalesce(sum(CASE WHEN event_type = 'purchase'
                    AND epoch_us(ts) > mid_us
                    THEN CAST(round(value*100) AS BIGINT) END), 0) AS y
        FROM events, b GROUP BY user_id
        """
    ).fetchall()
    import hashlib

    def arm_of(uid):
        h = int(
            hashlib.md5(
                f"{experiment.CUPED_SALT}:{uid}".encode()
            ).hexdigest()[:8],
            16,
        )
        return h % 2

    n = len(raw)
    sx = sum(x for _, x, _ in raw)
    sy = sum(y for _, _, y in raw)
    sxx = sum(x * x for _, x, _ in raw)
    sxy = sum(x * y for _, x, y in raw)
    theta = (
        (n * sxy - sx * sy) / (n * sxx - sx * sx)
        if n * sxx - sx * sx > 0
        else 0.0
    )
    for r in rows:
        members = [(x, y) for uid, x, y in raw if arm_of(uid) == r.arm]
        assert r.n_arm == len(members)
        assert r.pre_c == sum(x for x, _ in members)
        assert r.post_c == sum(y for _, y in members)
        assert r.theta == pytest.approx(theta, rel=1e-12)
        want_adj = (
            r.post_c / r.n_arm
            - theta * (r.pre_c / r.n_arm - sx / n)
        )
        assert r.mean_post == pytest.approx(r.post_c / r.n_arm, rel=1e-12)
        assert r.mean_post_adj == pytest.approx(want_adj, rel=1e-12)
    # grand-mean preservation: sum_a n_a * adj_a == sy (CUPED is
    # unbiased for the pooled metric)
    tot_adj = sum(r.n_arm * r.mean_post_adj for r in rows)
    assert tot_adj == pytest.approx(sy, rel=1e-9)
