"""Scale-ratio pins over the committed bench artifact.

BENCH_DETAIL.json carries per-query wall times at the primary sf and
a 10x-smaller secondary sf (the input to scripts/scaling_report.py).
For queries whose whole design exists to keep work sublinear in the
corpus — cluster-then-prune, banded candidates — the 10x-data ratio
IS the scale contract, so pin it: round 7 accepted semdedup's
corpus-scaled K (cluster size held flat, pair work linear in N) with
the explicit follow-up that its constant factor be re-proven at each
corpus step. A ratio drifting past the bound means the fold
assignment (or a future edit) went superlinear and the 100-TB story
is broken, even if correctness stays green.

The pin reads the COMMITTED artifact (refreshed by each round's
sf0.1 bench run), so it is deterministic for CI — it fails the round
that commits a regressed bench, not randomly under load.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: query -> max allowed (primary/secondary) wall-time ratio across
#: the 10x data step. 10.0 = perfectly linear; these queries claim
#: strong sublinearity by design.
RATIO_BOUNDS = {
    # cluster-then-prune with corpus-scaled K (r7 ADVICE follow-up)
    "semdedup_summary": 2.5,
    "semdedup_keep": 2.5,
    # banded LSH: candidate generation must stay bucket-bounded
    "dedup_minhash_lsh": 3.0,
    # shard-vs-store admission check: cost tracks the SHARD
    "dedup_incr_near": 3.0,
}


def _detail():
    path = os.path.join(REPO, "BENCH_DETAIL.json")
    if not os.path.exists(path):
        pytest.skip("no committed BENCH_DETAIL.json")
    d = json.load(open(path))
    if "secondary" not in d or d.get("sf") != 10 * d["secondary"]["sf"]:
        pytest.skip("bench artifact lacks a 10x secondary sweep")
    return d


@pytest.mark.parametrize("name", sorted(RATIO_BOUNDS))
def test_ten_x_data_ratio_stays_sublinear(name):
    d = _detail()
    prim, sec = d["queries"], d["secondary"]["queries"]
    if name not in prim or name not in sec or sec[name] <= 0:
        pytest.skip(f"{name} not in both sweeps of the artifact")
    ratio = prim[name] / sec[name]
    assert ratio <= RATIO_BOUNDS[name], (
        f"{name}: sf{d['secondary']['sf']}→sf{d['sf']} wall-time ratio "
        f"{ratio:.2f} exceeds the {RATIO_BOUNDS[name]} scale pin — the "
        "plan (or its constant factor) regressed superlinearly; see "
        "SCALING.md and the module's 100-TB design note"
    )
