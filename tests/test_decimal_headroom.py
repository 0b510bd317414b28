"""128-bit accumulator headroom at target scale (round-8 verdict ask).

The three DECIMAL(38,0) accumulation sites (tpch_pricing_summary's
sum_charge, warehouse_ext's promo revenue pair, tpch_top_supplier_
share's revenue total) were widened in round 8 because their unit
sums wrap BIGINT between sf0.7 and sf200. This test closes the loop
the widening opened: prove the WIDE form itself has headroom at the
engine's design point — a 100 TB corpus, i.e. ~10^6 × the largest
committed fixture (sf0.1 ≈ 100 MB) — including the half-up lift
(`num * 2*10^digits + den`, functions/exact.py:78) that is the true
worst-case intermediate, with a further 10× safety margin.

Measured from the sf0.1 parquet via DuckDB HUGEINT (exact integer
math, no Spark session needed): per-group magnitudes scale linearly
with data volume here because every grouping key set is bounded
(6 flag/status pairs, a fixed month span, one global total), so
rows-per-group — not groups — absorbs the scale-up.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import make_duck

SF_DIR = "/root/testdata/sf0.1"

#: sf0.1 fixture -> 100 TB corpus
SCALE_UP = 10**6
#: demand one extra order of magnitude beyond the design point
SAFETY = 10
#: DECIMAL(38,0) / HUGEINT capacity floor (10^38 - 1 exactly; 2^127
#: is slightly above — use the decimal bound, it is the tighter one)
CAP = 10**38

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.1 fixture not generated"
)


def _one(con, sql: str) -> int:
    return int(con.sql(sql).fetchone()[0])


@pytest.fixture(scope="module")
def duck_sf01():
    con = make_duck(SF_DIR)
    yield con
    con.close()


def test_sum_charge_accumulator_headroom(duck_sf01):
    """tpch.py:128-146 — _ch sums 1e-6-dollar units per (returnflag,
    linestatus); display lift is * 2*10^2 + den."""
    worst_group = _one(
        duck_sf01,
        """
        SELECT max(abs(s)) FROM (
          SELECT sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                     * (100 - CAST(round(l_discount * 100) AS INT))
                     * (100 + CAST(round(l_tax * 100) AS INT))) AS s
          FROM lineitem
          WHERE l_shipdate <= DATE '2000-12-31'
          GROUP BY l_returnflag, l_linestatus)
        """,
    )
    lift = 2 * 10**2
    den = 10**6
    assert (worst_group * SCALE_UP * lift + den) * SAFETY < CAP


def test_promo_revenue_accumulator_headroom(duck_sf01):
    """warehouse_ext.py:77-94 — _promo/_total sum 1e-4-dollar units
    per ship month; promo_pct's intermediate is _promo*100 * 2*10^4
    + _total (the widest of the pair)."""
    worst_month_total = _one(
        duck_sf01,
        """
        SELECT max(abs(s)) FROM (
          SELECT sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                     * (100 - CAST(round(l_discount * 100) AS INT))) AS s
          FROM lineitem
          GROUP BY date_trunc('month', l_shipdate))
        """,
    )
    num_lift = 100 * 2 * 10**4
    scaled_total = worst_month_total * SCALE_UP
    assert (scaled_total * num_lift + scaled_total) * SAFETY < CAP


def test_supplier_share_accumulator_headroom(duck_sf01):
    """tpch.py:495-515 — share_pct's intermediate is the GLOBAL
    revenue total as denominator and a per-supplier numerator *100 *
    2*10^4; the denominator (one group: everything) is the binding
    magnitude."""
    global_total = _one(
        duck_sf01,
        """
        SELECT abs(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                       * (100 - CAST(round(l_discount * 100) AS INT))))
        FROM lineitem
        """,
    )
    num_lift = 100 * 2 * 10**4
    scaled = global_total * SCALE_UP
    # numerator (per-supplier revenue) is bounded by the global total
    assert (scaled * num_lift + scaled) * SAFETY < CAP
