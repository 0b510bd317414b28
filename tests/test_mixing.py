"""Domain-mixture rebalancing: oracle parity plus the properties the
hash-threshold design must guarantee (determinism, subset-closure,
budget realization)."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import mixing
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(mixing.QUERIES))
def test_mixing_vs_oracle(spark, duck, name):
    df = mixing.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, mixing.ORACLES[name], name=name)


def test_resample_is_non_degenerate_and_consistent(spark):
    """The char-balanced thresholds must actually drop something (the
    fixtures' per-source char totals differ), keep the min-total
    source intact, and mix_weights.n_kept must equal the realized
    per-source resample counts."""
    w = {r.source: r for r in mixing.mix_weights(spark, SF_DIR_SMOKE).collect()}
    kept = (
        mixing.mix_resample(spark, SF_DIR_SMOKE)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    kept = {r.source: r.n for r in kept}
    assert any(r.threshold_ppm < mixing.PPM for r in w.values()), (
        "all thresholds saturated — balancing is a no-op on this corpus"
    )
    mn_src = min(w.values(), key=lambda r: r.total_chars).source
    assert w[mn_src].threshold_ppm == mixing.PPM
    for s, r in w.items():
        assert kept.get(s, 0) == r.n_kept


def test_acceptance_is_per_doc_deterministic(spark):
    """A document's fate depends only on (doc_id, its source's
    threshold): re-running the resample yields the identical keep
    set — no RNG, no partition sensitivity."""
    a = {r.doc_id for r in mixing.mix_resample(spark, SF_DIR_SMOKE).collect()}
    b = {r.doc_id for r in mixing.mix_resample(spark, SF_DIR_SMOKE).collect()}
    assert a == b and len(a) > 0
