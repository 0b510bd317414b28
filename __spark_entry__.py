"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bike_analyzer_spark``; this module only
aggregates the per-operator QUERIES/ORACLES registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bike_analyzer_spark.operators import (
    analytics_ext,
    asof,
    classifier,
    curate,
    dedup,
    fuzzy,
    graph,
    hypertable,
    importance,
    ivf,
    kpi,
    layout,
    lm,
    mixing,
    multimodal,
    od,
    packing,
    pq,
    profile,
    quality,
    rangejoin,
    readers,
    sampling,
    scale,
    scrub,
    semdedup,
    similarity,
    substring,
    text,
    tpch,
    vocab,
    windows,
)

# Ordering matters: the driver's correctness check records only the
# FIRST 50 queries in registration order, so the newest / least
# driver-proven modules go first (round-3 verdict: graph..scale were
# silently outside the window).  Long-stable two-round-green modules
# rotate to the back; the local oracle suite (tests/oracle.py) still
# runs every query regardless of order.  The invariant "every query
# with <2 consecutive driver-green rounds sits inside the window" is
# ENFORCED by tests/test_rotation.py, which derives green streaks
# from the CORRECTNESS_r*.json history.
class _Slice:
    """A registration-order slice of one module's QUERIES/ORACLES.

    Rotation needs finer granularity than whole modules: by end of
    round 6 all 50 window slots hold unproven queries, so every
    mixed module (kpi, dedup, readers, windows, analytics_ext,
    graph) is sliced — its unproven queries sit inside the window
    while its proven tail rotates out. Queries and oracles are
    untouched; only the registration order changes.
    """

    def __init__(self, mod, names):
        self.QUERIES = {k: mod.QUERIES[k] for k in names}
        self.ORACLES = {
            k: mod.ORACLES[k]
            for k in names
            if k in getattr(mod, "ORACLES", {})
        }


def _split(mod, head_names):
    head = _Slice(mod, head_names)
    tail = _Slice(mod, [k for k in mod.QUERIES if k not in head_names])
    return head, tail


_kpi_head, _kpi_tail = _split(
    kpi,
    [
        "q1_network_summary",
        "q3_hourly_profile",
        "q4_hourly_correlation",
        "a2_time_bounds",
    ],
)
_dedup_head, _dedup_tail = _split(dedup, ["dedup_incr_near"])
_readers_head, _readers_tail = _split(
    readers, ["p2_time_range", "s14_sql_corpus"]
)
_windows_head, _windows_tail = _split(
    windows,
    [
        "w1_lag_delta",
        "w4_sliding_hour_avg",
        "a7_last_per_bucket",
        "w3_latest_snapshot",
    ],
)
_ana_head, _ana_tail = _split(
    analytics_ext, ["rollup_by_type_hour", "pivot_hour_by_type"]
)
_graph_head, _graph_tail = _split(graph, ["od_pagerank"])

_MODULES = [
    # r7 window (exactly 50 queries): the 48 one-streak r6-window
    # queries MUST stay inside (test_rotation), and the two slots
    # freed by the now-2-streak pq pair (rotated to the proven back
    # section) take the two NEW r7 tpch queries (tpch_large_volume,
    # tpch_volume_shipping — streak 0). Every other module keeps its
    # r6 slicing: kpi, dedup, readers, windows, analytics_ext, and
    # graph contribute their unproven heads while their proven tails
    # sit outside. Adding ONE more driver query this round would push
    # an unproven query outside the window (test_rotation red).
    tpch,
    classifier,
    layout,
    semdedup,
    importance,
    substring,
    vocab,
    fuzzy,
    packing,
    mixing,
    scrub,
    lm,
    profile,
    rangejoin,
    hypertable,
    asof,
    od,
    _windows_head,
    _readers_head,
    _ana_head,
    _graph_head,
    _dedup_head,
    _kpi_head,
    _windows_tail,
    _ana_tail,
    _graph_tail,
    _readers_tail,
    _dedup_tail,
    _kpi_tail,
    # outside the window (all ≥2 consecutive greens, none touch
    # events.ts). Round 6 changed their PHYSICAL read path (documents/
    # embeddings now read a many-file spread copy); window capacity is
    # exhausted by 0-streak queries, so instead of driver re-proof the
    # change was verified by the full-precision local oracle suite AND
    # a complete driver-style value comparison of the whole corpus
    # (all 92 queries at end of round) at BOTH 8 and 32 shuffle
    # partitions (order-sensitivity would differ between parallelism
    # levels; it did not).
    quality,
    sampling,
    curate,
    scale,
    ivf,
    # pq rotated out in r7: both queries 2-streak (r5+r6 green) and
    # untouched this round; its slots host the two new tpch queries
    pq,
    similarity,
    text,
    multimodal,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Top-10 value-to-balance ratio: exercises the latest-snapshot
    scalar max, broadcast dim join, null-guarded rounded ratio, and
    deterministic top-k (reference sql/queries.sql:16-31).
    """
    return kpi.q2_top10_value_ratio(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(getattr(m, "ORACLES", {}))
    return out
