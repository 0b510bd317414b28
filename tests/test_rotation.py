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
"""

from __future__ import annotations

import glob
import json
import os

DRIVER_WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_streaks() -> dict[str, int]:
    streak: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            recs = json.load(f)
        for q, rec in recs.items():
            ok = bool(
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
            )
            streak[q] = streak.get(q, 0) + 1 if ok else 0
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
    assert not stragglers, (
        f"queries with <2 consecutive driver-green rounds are outside the "
        f"driver's first-{DRIVER_WINDOW} correctness window — reorder "
        f"_MODULES in __spark_entry__.py: {stragglers}"
    )


def test_registry_is_consistent():
    """Every query has a callable; every oracle key is a query key (a
    dangling oracle means a renamed query silently loses its gate)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert all(callable(f) for f in qs.values())
    dangling = sorted(set(oracles) - set(qs))
    assert not dangling, f"oracles without a matching query: {dangling}"
