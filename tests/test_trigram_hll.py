"""Journey trigrams and the HLL sketch beyond the oracle gate:
python recounts of both — the trigram scan from raw event streams,
the HLL from a from-scratch register simulation."""

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import pytest

from bike_analyzer_spark.operators import scale, sequences
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_path_trigrams_vs_oracle(spark, duck):
    assert_matches_oracle(
        sequences.path_trigrams(spark, SF_DIR_ORACLE),
        duck,
        sequences.ORACLES["path_trigrams"],
        name="path_trigrams",
    )


def test_path_trigrams_matches_python_scan(spark):
    streams = defaultdict(list)
    for uid, et, us, eid in duckdb.sql(
        f"""SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)), event_id
        FROM '{SF_DIR_ORACLE}/events.parquet'"""
    ).fetchall():
        streams[uid].append((us, eid, et))
    tri: Counter = Counter()
    for evs in streams.values():
        evs.sort()
        types = [et for _, _, et in evs]
        tri.update(zip(types, types[1:], types[2:]))
    total = sum(tri.values())
    want = sorted(
        ((n, k) for k, n in tri.items()),
        key=lambda x: (-x[0], x[1]),
    )[: sequences.TRIGRAM_TOP]
    got = sequences.path_trigrams(spark, SF_DIR_ORACLE).collect()
    assert len(got) == len(want)
    for r, (n, (s1, s2, s3)) in zip(got, want):
        assert (r.step1, r.step2, r.step3, r.n) == (s1, s2, s3, n)
        assert abs(r.share_pct - 100 * n / total) <= 5e-3


def _hash32(s: str) -> int:
    return int(
        hashlib.md5(f"{scale.HLL_SALT}:{s}".encode()).hexdigest()[:8], 16
    )


def test_hll_matches_python_simulation(spark):
    users = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT user_id FROM "
            f"'{SF_DIR_ORACLE}/events.parquet'"
        ).fetchall()
    ]
    regs: dict = {}
    low = scale.HLL_LOW_BITS
    for u in users:
        h = _hash32(str(u))
        reg, lo = h >> low, h % (1 << low)
        rho = (
            low + 1
            if lo == 0
            else (lo & -lo).bit_length()  # trailing-zero rank
        )
        regs[reg] = max(regs.get(reg, 0), rho)
    m = scale.HLL_M
    s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / s
    if est <= 2.5 * m and len(regs) < m:
        est = m * math.log(m / (m - len(regs)))
    row = scale.hll_user_estimate(spark, SF_DIR_ORACLE).collect()[0]
    assert row.m == m
    assert row.filled == len(regs)
    assert row.n_exact == len(users)
    assert row.hll_estimate == pytest.approx(est, rel=1e-12)
    # the sketch must be in the right ballpark: 5 sigma of 1.04/sqrt(m)
    assert abs(row.hll_estimate - len(users)) <= max(
        5 * 1.04 / math.sqrt(m) * len(users), 3
    )


def test_hll_vs_oracle(spark, duck):
    assert_matches_oracle(
        scale.hll_user_estimate(spark, SF_DIR_ORACLE),
        duck,
        scale.ORACLES["hll_user_estimate"],
        name="hll_user_estimate",
    )


def test_hll_grouped_vs_oracle(spark, duck):
    assert_matches_oracle(
        scale.hll_grouped_estimate(spark, SF_DIR_ORACLE),
        duck,
        scale.ORACLES["hll_grouped_estimate"],
        name="hll_grouped_estimate",
    )


def test_hll_grouped_consistent_with_global(spark):
    """Per-group exact counts sum-check against raw data and the
    per-group sketch stays in the global sketch's error regime."""
    rows = scale.hll_grouped_estimate(spark, SF_DIR_ORACLE).collect()
    want = dict(
        duckdb.sql(
            f"""SELECT event_type, count(DISTINCT user_id)
            FROM '{SF_DIR_ORACLE}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    assert {r.event_type: r.n_exact for r in rows} == want
    for r in rows:
        assert r.filled <= r.m
        assert abs(r.hll_estimate - r.n_exact) <= max(
            5 * 1.04 / math.sqrt(r.m) * r.n_exact, 3
        )
        assert r.err_ppm == round(
            (r.hll_estimate - r.n_exact) / r.n_exact * 1e6
        ) or abs(
            r.err_ppm
            - (r.hll_estimate - r.n_exact) / r.n_exact * 1e6
        ) <= 1


def test_hll_overlap_vs_oracle(spark, duck):
    from bike_analyzer_spark.operators import scale

    assert_matches_oracle(
        scale.hll_overlap_estimate(spark, SF_DIR_ORACLE),
        duck,
        scale.ORACLES["hll_overlap_estimate"],
        name="hll_overlap_estimate",
    )


def test_hll_overlap_inclusion_exclusion_identities(spark):
    """The merged-union estimate obeys sketch algebra: est(A∪B) is at
    least each side's estimate (register max can only grow) and the
    inclusion-exclusion overlap approximates the exact intersection
    within the m=256 error regime (generous 25% + small-count slack,
    like the point-estimate pins)."""
    from bike_analyzer_spark.operators import scale

    r = scale.hll_overlap_estimate(spark, SF_DIR_ORACLE).collect()[0]
    assert r.est_union >= max(r.est_a, r.est_b) - 1e-9
    assert r.overlap_estimate == pytest.approx(
        r.est_a + r.est_b - r.est_union, abs=1e-9
    )
    assert r.n_exact_overlap > 0, "fixture audiences never overlap"
    assert abs(r.overlap_estimate - r.n_exact_overlap) <= max(
        0.25 * r.n_exact_overlap, 120
    )
