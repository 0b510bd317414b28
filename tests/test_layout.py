"""Z-order layout audit: oracle parity, Morton-key properties, and
the data-skipping claim itself (z files tight in both dimensions,
time files tight in one)."""

import pytest

from bike_analyzer_spark.operators import layout
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_layout_vs_oracle(spark, duck):
    df = layout.zorder_layout_stats(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, layout.ORACLES["zorder_layout_stats"],
        name="zorder_layout_stats",
    )


def _morton_py(u: int, t: int) -> int:
    z = 0
    for i in range(layout.GRID_BITS):
        z |= ((u >> i) & 1) << (2 * i + 1)
        z |= ((t >> i) & 1) << (2 * i)
    return z


def test_morton_column_matches_scalar_reference(spark):
    """The column-algebra interleave equals the textbook bit-twiddling
    loop on every grid cell pair (property: 256 random + corners)."""
    import random

    rng = random.Random(7)
    pairs = [(0, 0), (255, 255), (255, 0), (0, 255)] + [
        (rng.randrange(256), rng.randrange(256)) for _ in range(256)
    ]
    df = spark.createDataFrame(pairs, "u int, t int")
    got = {
        (r.u, r.t): r.z
        for r in df.select(
            "u", "t", layout._morton(df.u, df.t).alias("z")
        ).collect()
    }
    for u, t in pairs:
        assert got[(u, t)] == _morton_py(u, t), (u, t)


def test_zorder_files_tight_in_both_dimensions(spark):
    """The point of the layout: mean per-file span under z-cuts is
    well below full range in BOTH dimensions, while time-cuts leave
    the user span ~full (unskippable)."""
    rows = layout.zorder_layout_stats(spark, SF_DIR_ORACLE).collect()
    full = (1 << layout.GRID_BITS) - 1
    z = [r for r in rows if r.layout == "zorder"]
    t = [r for r in rows if r.layout == "time"]
    assert z and t
    z_u = sum(r.u_span for r in z) / len(z)
    z_t = sum(r.t_span for r in z) / len(z)
    t_u = sum(r.u_span for r in t) / len(t)
    assert z_u < 0.5 * full and z_t < 0.5 * full
    assert t_u > 0.9 * full
    # both layouts partition the whole table
    n = sum(r.n_rows for r in rows)
    assert sum(r.n_rows for r in z) == sum(r.n_rows for r in t) == n // 2
