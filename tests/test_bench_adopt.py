"""Pins the bench --adopt gate (round-12 verdict ask #2).

Round 11 proved the summary ``clean`` flag (loadavg_start < 4.0) is
too generous for artifact adoption: the driver's loadavg-3.95 run
carried clean:true while executing at a uniform 1.28x median
per-query inflation vs the committed idle-window detail. Adoption of
BENCH_DETAIL.json therefore requires a genuinely idle start
(loadavg_start < 1.0) and no floor inversion; this module pins both
the threshold constant and the decision function so a future
loosening is a deliberate, visible edit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_adopt_threshold_is_strictly_tighter_than_clean_flag():
    # `clean` means loadavg_start < 4.0 (bench.main); adoption must be
    # strictly tighter or the r11 failure mode (a clean-flagged 1.28x
    # inflated run becoming the artifact) returns.
    assert bench.ADOPT_LOADAVG_MAX == 1.0


def test_idle_run_is_adoptable():
    assert bench.adoptable(0.09, floor_inverted=False)
    assert bench.adoptable(0.99, floor_inverted=False)


def test_clean_but_contended_run_is_refused():
    # The exact r11 case: loadavg 3.95 passes the clean flag (< 4.0)
    # but measured 1.28x inflated — must NOT be adoptable.
    assert not bench.adoptable(3.95, floor_inverted=False)
    assert not bench.adoptable(1.0, floor_inverted=False)  # boundary


def test_floor_inversion_refuses_even_an_idle_start():
    # r10: a loadavg-0.02 start still ran contended mid-run (the
    # sf0.01 secondary outpaced the sf0.1 primary). The inversion
    # tell must veto regardless of the start loadavg.
    assert not bench.adoptable(0.02, floor_inverted=True)


def test_wrong_sf_run_is_refused_regardless_of_idleness():
    # The artifact is defined as the sf0.1+sf0.01 sweep; an idle
    # debugging run at sf0.001 (or with the secondary disabled) must
    # never replace it — test_scaling_pin.py SKIPS (not fails) on a
    # malformed artifact, so this is the only guard.
    assert not bench.adoptable(0.0, False, sf=0.001, secondary_sf=None)
    assert not bench.adoptable(0.0, False, sf=0.1, secondary_sf=None)
    assert not bench.adoptable(0.0, False, sf=0.01, secondary_sf=0.001)
    assert bench.adoptable(0.0, False, sf=0.1, secondary_sf=0.01)


def test_cpu_jiffies_shape():
    # steal provenance (r12): (steal, total) jiffies, total > steal
    # >= 0 on Linux; None is tolerated off-Linux but not here.
    j = bench._cpu_jiffies()
    assert j is not None
    steal, total = j
    assert 0 <= steal < total


def test_bench_health_flags_localized_contention(tmp_path):
    # The r12 failure mode the loadavg gate cannot see: a run that
    # starts idle but carries a contiguous block of queries at
    # several times their reference (hypervisor steal window). The
    # health gate must reject it, and must NOT punish queries that
    # got FASTER (that is what an optimization round produces).
    import json
    import subprocess
    import sys as _sys

    ref = {"kind": "bench_detail", "queries": {f"q{i:03d}": 1.0 for i in range(60)}}
    cand = {"kind": "bench_detail", "queries": dict(ref["queries"])}
    cand["queries"]["q000"] = 0.2          # optimized: never a spike
    for i in range(30, 36):                # contention window
        cand["queries"][f"q{i:03d}"] = 4.0
    rp, cp = tmp_path / "ref.json", tmp_path / "cand.json"
    rp.write_text(json.dumps(ref))
    cp.write_text(json.dumps(cand))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "bench_health.py"),
         str(cp), str(rp)],
        capture_output=True, text=True,
    )
    assert r.returncode == 1 and "CONTAMINATED" in r.stdout

    cand["queries"] = dict(ref["queries"])
    cand["queries"]["q000"] = 0.2
    cp.write_text(json.dumps(cand))
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "bench_health.py"),
         str(cp), str(rp)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0 and "CLEAN" in r.stdout


def test_bench_median_merges_per_query(tmp_path):
    # r13: the committed artifact is the per-query MEDIAN of K
    # gate-passing runs, not the running minimum of every run ever
    # adopted (the r12-verdict ratchet). A steal window inflating one
    # query in one run must not survive the merge.
    import json
    import subprocess
    import sys as _sys

    def det(a, b, sa, sb):
        return {
            "kind": "bench_detail", "sf": 0.1,
            "queries": {"qa": a, "qb": b},
            "secondary": {"sf": 0.01, "queries": {"qa": sa, "qb": sb},
                          "reps": 1},
        }

    paths = []
    for i, d in enumerate([det(1.0, 2.0, 0.5, 0.6),
                           det(1.2, 9.0, 0.5, 0.7),   # qb hit by steal
                           det(1.1, 2.1, 0.6, 0.8)]):
        p = tmp_path / f"in{i}.json"
        p.write_text(json.dumps(d))
        paths.append(str(p))
    out = tmp_path / "out.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "bench_median.py"),
         str(out), *paths],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    merged = json.loads(out.read_text())
    assert merged["queries"] == {"qa": 1.1, "qb": 2.1}
    assert merged["secondary"]["queries"] == {"qa": 0.5, "qb": 0.7}
    assert merged["merged_from"] == 3
