"""Market-basket co-occurrence: oracle parity, support identities
(c_xy <= min(c_x, c_y) <= n_baskets), pair completeness over the
type domain, and lift/PMI consistency recomputed in pure Python."""

import math

from bike_analyzer_spark.operators import assoc
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_event_cooccurrence_vs_oracle(spark, duck):
    assert_matches_oracle(
        assoc.event_cooccurrence(spark, SF_DIR_ORACLE),
        duck,
        assoc.ORACLES["event_cooccurrence"],
        name="event_cooccurrence",
    )


def test_support_identities_and_pmi(spark):
    rows = assoc.event_cooccurrence(spark, SF_DIR_ORACLE).collect()
    types = {r.item_x for r in rows} | {r.item_y for r in rows}
    # every unordered pair of the observed type domain is present —
    # this fixture's hour-baskets co-populate all of them
    assert len(rows) == len(types) * (len(types) - 1) // 2
    n = rows[0].n_baskets
    for r in rows:
        assert r.item_x < r.item_y
        assert 0 < r.c_xy <= min(r.c_x, r.c_y) <= n == r.n_baskets
        lift = r.c_xy * n / (r.c_x * r.c_y)
        assert abs(r.lift - lift) <= 5e-7
        # quantized micro-nats; allow 1 ulp of libm-ln skew at the
        # rounding boundary (the accepted quantization error class)
        assert abs(r.pmi - math.log(lift)) <= 1.01e-6
    # baskets must differentiate behavior: if every pair had lift 1
    # the basket key is degenerate and the math is untested
    assert any(abs(r.lift - 1.0) > 1e-3 for r in rows)
