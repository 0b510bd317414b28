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


def test_write_zorder_files_have_tight_footer_stats(spark, tmp_path):
    """The write path, verified from the PARQUET FOOTERS of what it
    actually lands (not the audit query): per-file min/max stats for
    user_id and ts are tight in both dimensions under z-order, while
    a plain time-sorted write leaves user_id spans ~full."""
    import os

    import pyarrow.parquet as papq

    from bike_analyzer_spark.sources.catalog import load

    zpath = str(tmp_path / "events_z")
    tpath = str(tmp_path / "events_t")
    layout.write_zorder(spark, SF_DIR_ORACLE, zpath)
    ev = load(spark, SF_DIR_ORACLE, "events")
    (
        ev.repartitionByRange(layout.N_FILES, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(tpath)
    )

    def spans(path, col):
        """Per-file (min, max) of `col`, read from the parquet FOOTER
        statistics — what an engine's file-skipping actually sees."""
        out = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            md = papq.ParquetFile(os.path.join(path, f)).metadata
            los, his = [], []
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                idx = next(
                    i
                    for i in range(row_group.num_columns)
                    if row_group.column(i).path_in_schema == col
                )
                st = row_group.column(idx).statistics
                assert st is not None, f"no stats for {col} in {f}"
                los.append(st.min)
                his.append(st.max)
            out.append((min(los), max(his)))
        return out

    u_all = [r.user_id for r in ev.select("user_id").collect()]
    u_range = max(u_all) - min(u_all)
    z_spans = spans(zpath, "user_id")
    t_spans = spans(tpath, "user_id")
    z_mean = sum(hi - lo for lo, hi in z_spans) / len(z_spans)
    t_mean = sum(hi - lo for lo, hi in t_spans) / len(t_spans)
    assert z_mean < 0.5 * u_range        # z files skippable on user_id
    assert t_mean > 0.9 * u_range        # time files are not
    # ts stays reasonably tight under z-order too (quarter range)
    ts_spans = spans(zpath, "ts")
    full_ts = max(hi for _, hi in ts_spans) - min(lo for lo, _ in ts_spans)
    z_ts_mean = sum(
        (hi - lo).total_seconds() if hasattr(hi - lo, "total_seconds")
        else hi - lo
        for lo, hi in ts_spans
    ) / len(ts_spans)
    full_ts_s = (
        full_ts.total_seconds() if hasattr(full_ts, "total_seconds")
        else full_ts
    )
    assert z_ts_mean < 0.5 * full_ts_s
    # lossless: the z-ordered copy holds exactly the source rows
    assert (
        spark.read.parquet(zpath).select("event_id").exceptAll(
            ev.select("event_id")
        ).count()
        == 0
    )
    assert spark.read.parquet(zpath).count() == ev.count()
