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
