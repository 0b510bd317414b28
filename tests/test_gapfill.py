"""Gap-fill correctness: oracle parity plus the structural
guarantees the dense grid is supposed to deliver."""

from pyspark.sql import functions as F

from bike_analyzer_spark.operators import gapfill
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_gapfill_vs_oracle(spark, duck):
    df = gapfill.hypertable_gapfill(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, gapfill.ORACLES["hypertable_gapfill"],
        name="hypertable_gapfill",
    )


def test_grid_is_dense_and_anchored(spark):
    """Per series: consecutive hour buckets with no holes, gap rows
    actually exist (otherwise the query proves nothing), every gap
    row interpolates to a value between its neighbours' LOCF/next
    anchors, and observed rows pass through untouched."""
    rows = gapfill.hypertable_gapfill(spark, SF_DIR_ORACLE).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    saw_gap = False
    for series in by_type.values():
        hours = [r["bucket_us"] // gapfill.HOUR_US for r in series]
        assert hours == list(range(hours[0], hours[-1] + 1)), "holes"
        # endpoints are observations (anchors are per-series min/max)
        assert series[0]["has_data"] and series[-1]["has_data"]
        for i, r in enumerate(series):
            if r["has_data"]:
                assert r["interp_sum_v"] == r["locf_sum_v"]
                continue
            saw_gap = True
            assert r["n_events"] == 0
            prev_obs = next(
                s for s in reversed(series[:i]) if s["has_data"]
            )
            next_obs = next(s for s in series[i + 1:] if s["has_data"])
            assert r["locf_sum_v"] == prev_obs["locf_sum_v"]
            lo = min(prev_obs["interp_sum_v"], next_obs["interp_sum_v"])
            hi = max(prev_obs["interp_sum_v"], next_obs["interp_sum_v"])
            assert lo - 1e-9 <= r["interp_sum_v"] <= hi + 1e-9
    assert saw_gap, "fixture has no gaps — query untested"


def test_grid_rowcount_is_span_bounded(spark):
    """Output rows = Σ per-series (span_hours + 1) — the grid is
    time-bounded, independent of event count."""
    df = gapfill.hypertable_gapfill(spark, SF_DIR_ORACLE)
    spans = (
        df.groupBy("event_type")
        .agg(
            ((F.max("bucket_us") - F.min("bucket_us"))
             / gapfill.HOUR_US + 1).alias("expect"),
            F.count(F.lit(1)).alias("got"),
        )
        .collect()
    )
    for r in spans:
        assert r["got"] == int(r["expect"])
