"""Correctness-window rotation invariant.

The driver records only the FIRST 50 queries of ``queries()`` in
CORRECTNESS_r{N}.json. Round 3 proved how easily new operators drift
outside that window silently (10 queries shipped un-driver-verified
while README claimed otherwise); round 4 fixed it with a manual
reorder. This test automates the policy so it can't drift again:

    every query lacking 2 consecutive driver-green rounds MUST appear
    within the first 50 of the registration order.

Green streaks are derived straight from the committed
CORRECTNESS_r*.json history — present+green extends the streak,
present+red resets it, absent leaves it unchanged (the query was not
checked that round, which is neither evidence for nor against). A
query never recorded (e.g. newly added) has streak 0.

Two amendments to the base rule:

* **Round-5 ts-unit invalidation.** The round-5 testdata regeneration
  changed events.ts from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) while
  the loader hard-assumed nanos, so every query deriving buckets,
  sessions, ranges, or hour strings from events.ts produced wrong
  answers that round — including seven queries that sat OUTSIDE the
  driver window and so have no red record. All 22 affected queries
  have their streak forced to 0 through round 5: greens earned on
  pre-fix timestamps are not evidence. They re-earn proven status
  from round 6 onward.

* **Edited-module policy (manual).** Streaks do not auto-reset when
  an operator module is edited after its last green round; rotating
  a meaningfully-changed query back inside the window is a manual
  step for the round that ships the change (considered: comparing
  module git-blob ages against the newest CORRECTNESS file — too
  coarse, any comment touch would evict a proven module).
"""

from __future__ import annotations

import glob
import json
import os
import re

DRIVER_WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Queries whose round-≤5 results (green, red, or unrecorded) are void:
#: they consume events.ts, which the loader read at 1000x the true
#: unit in round 5 (see tests/test_data_contract.py for the guard).
_R5_TS_INVALIDATED = frozenset(
    {
        "q1_network_summary",
        "q3_hourly_profile",
        "q4_hourly_correlation",
        "a2_time_bounds",
        "a7_last_per_bucket",
        "w1_lag_delta",
        "w3_latest_snapshot",
        "od_pagerank",
        "profile_events",
        "busy_islands",
        "range_join_busy",
        "hypertable_rollup",
        "asof_hourly_stats",
        "session_stats",
        "session_window_stats",
        "rollup_by_type_hour",
        "pivot_hour_by_type",
        "od_flows_topn",
        "od_flow_conservation",
        "od_flows_with_coords",
        "p2_time_range",
        "s14_sql_corpus",
    }
)


def _round_of(path: str) -> int:
    return int(re.search(r"r(\d+)", os.path.basename(path)).group(1))


def _green_streaks() -> dict[str, int]:
    streak: dict[str, int] = {}
    paths = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")), key=_round_of
    )
    for path in paths:
        with open(path) as f:
            recs = json.load(f)
        for q, rec in recs.items():
            ok = bool(
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
            )
            streak[q] = streak.get(q, 0) + 1 if ok else 0
        if _round_of(path) <= 5:
            for q in _R5_TS_INVALIDATED:
                streak[q] = 0
    return streak


def test_unproven_queries_inside_driver_window():
    import __spark_entry__ as entry_mod

    order = list(entry_mod.queries())
    streaks = _green_streaks()
    stragglers = [
        q
        for i, q in enumerate(order)
        if i >= DRIVER_WINDOW and streaks.get(q, 0) < 2
    ]
    overflow = getattr(entry_mod, "WINDOW_OVERFLOW", frozenset())
    assert set(stragglers) <= overflow, (
        f"queries with <2 consecutive driver-green rounds are outside the "
        f"driver's first-{DRIVER_WINDOW} correctness window — reorder "
        f"_MODULES in __spark_entry__.py: "
        f"{sorted(set(stragglers) - overflow)}"
    )


def test_overflow_only_when_window_is_full():
    """WINDOW_OVERFLOW is the pressure valve for a genuinely
    oversubscribed window, never a loophole: it may be non-empty only
    while EVERY window slot holds a query that must be there (streak
    <2, or a declared edited-module rotate-back), and declared names
    must actually be registered, outside, and unproven."""
    import __spark_entry__ as entry_mod

    overflow = getattr(entry_mod, "WINDOW_OVERFLOW", frozenset())
    if not overflow:
        return
    order = list(entry_mod.queries())
    streaks = _green_streaks()
    rotatebacks = getattr(entry_mod, "WINDOW_ROTATEBACKS", frozenset())
    soft = [
        q
        for q in order[:DRIVER_WINDOW]
        if streaks.get(q, 0) >= 2 and q not in rotatebacks
    ]
    assert not soft, (
        f"window slots held by proven, un-edited queries while overflow "
        f"is declared — rotate these out and pull the overflow in: {soft}"
    )
    outside = set(order[DRIVER_WINDOW:])
    for q in overflow:
        assert q in outside, f"overflow query {q} not registered outside"
        assert streaks.get(q, 0) < 2, (
            f"{q} is already proven — drop it from WINDOW_OVERFLOW"
        )


def test_round_files_sort_numerically():
    """r100 must sort after r11, not between r10 and r11 (lexicographic
    order breaks streak derivation once rounds reach 3 digits)."""
    assert _round_of("CORRECTNESS_r100.json") == 100
    files = ["CORRECTNESS_r2.json", "CORRECTNESS_r100.json",
             "CORRECTNESS_r11.json"]
    assert sorted(files, key=_round_of) == [
        "CORRECTNESS_r2.json",
        "CORRECTNESS_r11.json",
        "CORRECTNESS_r100.json",
    ]


def test_registry_is_consistent():
    """Every query has a callable; every oracle key is a query key (a
    dangling oracle means a renamed query silently loses its gate)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert all(callable(f) for f in qs.values())
    dangling = sorted(set(oracles) - set(qs))
    assert not dangling, f"oracles without a matching query: {dangling}"
