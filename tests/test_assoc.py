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


def test_type_affinity_vs_oracle(spark, duck):
    assert_matches_oracle(
        assoc.type_affinity_cosine(spark, SF_DIR_ORACLE),
        duck,
        assoc.ORACLES["type_affinity_cosine"],
        name="type_affinity_cosine",
    )


def test_type_affinity_python_recount(spark):
    """Rebuild every pair's quadratic forms from the raw events in
    pure Python and require exact integer equality (cosine then
    follows from the shared expression), plus Cauchy-Schwarz."""
    from collections import Counter

    from bike_analyzer_spark.sources.catalog import load

    ev = load(spark, SF_DIR_ORACLE, "events").select(
        "user_id", "event_type"
    ).collect()
    counts = Counter((r.user_id, r.event_type) for r in ev)
    by_type: dict[str, dict[int, int]] = {}
    for (u, t), c in counts.items():
        by_type.setdefault(t, {})[u] = c

    rows = assoc.type_affinity_cosine(spark, SF_DIR_ORACLE).collect()
    assert rows, "fixture must produce at least one type pair"
    for r in rows:
        vx, vy = by_type[r.item_x], by_type[r.item_y]
        both = set(vx) & set(vy)
        assert r.n_users_both == len(both)
        assert r.dot == sum(vx[u] * vy[u] for u in both)
        assert r.sxx == sum(c * c for c in vx.values())
        assert r.syy == sum(c * c for c in vy.values())
        expected = r.dot / math.sqrt(r.sxx * r.syy)
        assert r.cosine == expected  # same IEEE expression, bit-equal
        assert 0.0 <= r.cosine <= 1.0  # Cauchy-Schwarz, non-neg counts
