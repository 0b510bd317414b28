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
    curate,
    dedup,
    fuzzy,
    graph,
    hypertable,
    importance,
    ivf,
    kpi,
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

    Rotation needs finer granularity than whole modules: round 6 has
    38 unproven queries, leaving only 12 window slots for the proven
    tails of mixed modules — one module over what whole-module
    ordering can express. Slicing kpi lets its four ts-invalidated
    queries sit inside the window while its six proven scalar/probe
    queries rotate out. Queries and oracles are untouched; only the
    registration order changes.
    """

    def __init__(self, mod, names):
        self.QUERIES = {k: mod.QUERIES[k] for k in names}
        self.ORACLES = {
            k: mod.ORACLES[k]
            for k in names
            if k in getattr(mod, "ORACLES", {})
        }


_KPI_UNPROVEN = [
    "q1_network_summary",
    "q3_hourly_profile",
    "q4_hourly_correlation",
    "a2_time_bounds",
]
_kpi_head = _Slice(kpi, _KPI_UNPROVEN)
_kpi_tail = _Slice(kpi, [k for k in kpi.QUERIES if k not in _KPI_UNPROVEN])
_dedup_head = _Slice(dedup, ["dedup_incr_near"])
_dedup_tail = _Slice(
    dedup, [k for k in dedup.QUERIES if k != "dedup_incr_near"]
)
_readers_head = _Slice(readers, ["p2_time_range", "s14_sql_corpus"])
_readers_tail = _Slice(readers, ["p1_projected_notnull"])

_MODULES = [
    # r6 window (exactly 50 queries, 42 of them unproven): the new
    # semdedup + importance + substring + vocab + fuzzy + packing
    # modules (streak 0), every module touched by the r5 events.ts
    # unit invalidation (streak forced to 0, see
    # tests/test_rotation.py), and the two 1-streak pq queries. 42
    # unproven queries leave only 8 window slots for proven tails,
    # finer than whole-module ordering can express — so kpi, dedup,
    # and readers are sliced (see _Slice): their unproven queries
    # rotate in while their proven tails rotate out.
    semdedup,
    importance,
    substring,
    vocab,
    fuzzy,
    packing,
    mixing,
    scrub,
    lm,
    pq,
    profile,
    rangejoin,
    hypertable,
    asof,
    od,
    windows,
    _readers_head,
    analytics_ext,
    graph,
    _dedup_head,
    _kpi_head,
    _readers_tail,
    _dedup_tail,
    _kpi_tail,
    # outside the window (all ≥2 consecutive greens, none touch
    # events.ts). Round 6 changed their PHYSICAL read path (documents/
    # embeddings now read a many-file spread copy); window capacity is
    # exhausted by 0-streak queries, so instead of driver re-proof the
    # change was verified by the full-precision local oracle suite AND
    # a complete 74-query driver-style value comparison at BOTH 8 and
    # 32 shuffle partitions (order-sensitivity would differ between
    # parallelism levels; it did not).
    quality,
    sampling,
    curate,
    scale,
    ivf,
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
