"""Sequence packing: oracle parity plus the scan-algebra invariants
that the oracle's single global window can't distinguish from a buggy
two-level scan at one bucket (contiguity catches offset errors even
when every doc lands in bucket 0)."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import packing
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(packing.QUERIES))
def test_packing_vs_oracle(spark, duck, name):
    df = packing.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, packing.ORACLES[name], name=name)


def test_prefix_sum_is_contiguous(spark):
    """start_tok[i+1] == start_tok[i] + n_tokens[i] in doc_id order —
    the defining property of an exclusive scan; any bucket-offset bug
    (off-by-one window bounds, missed empty bucket) breaks it."""
    rows = packing.pack_assign(spark, SF_DIR_SMOKE).collect()
    assert rows[0].start_tok == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.start_tok == prev.start_tok + prev.n_tokens


def test_multi_bucket_scan_matches_single_window(spark):
    """Force multiple scan buckets (width 7) and check the two-level
    scan equals the naive single-window cumsum — the distributed
    algebra itself, not just the sf-fixture case where everything
    fits one bucket."""
    import bike_analyzer_spark.operators.packing as pk

    docs = (
        pk.load(spark, SF_DIR_SMOKE, "documents")
        .select(
            "doc_id",
            F.size(pk.tokens("text")).cast("bigint").alias("n_tokens"),
        )
    )
    old = pk.SCAN_BUCKET
    pk.SCAN_BUCKET = 7
    try:
        two_level = {
            r.doc_id: r.start_tok for r in pk._with_start_tok(docs).collect()
        }
    finally:
        pk.SCAN_BUCKET = old
    from pyspark.sql import Window

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("s"),
        ).collect()
    }
    assert two_level == naive


def test_packs_fill_to_context_len(spark):
    """Tokens started in pack p plus the carry-in from the straddler
    of pack p-1 fill CONTEXT_LEN exactly for every non-final pack:
    packing wastes nothing (contiguous concat has no padding)."""
    a = packing.pack_assign(spark, SF_DIR_SMOKE).collect()
    total = a[-1].start_tok + a[-1].n_tokens
    n_full_packs = total // packing.CONTEXT_LEN
    s = packing.pack_summary(spark, SF_DIR_SMOKE).collect()
    for row in s:
        if row.pack_id < n_full_packs - 1 or (
            row.pack_id == n_full_packs - 1 and total % packing.CONTEXT_LEN == 0
        ):
            assert row.n_docs >= 1


def test_packing_plan_shapes(spark):
    """The scan's scale contract, in the plan: bucket offsets come
    back via a BROADCAST join (metadata-sized side), and the only
    unpartitioned window runs over the per-bucket frame — the
    data-sized window is partitioned by bucket."""
    df = packing.pack_assign(spark, SF_DIR_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    windows = [l for l in plan.splitlines() if "Window " in l or l.strip().startswith("Window")]
    partitioned = [l for l in windows if "partitionBy" in l or "bucket#" in l]
    assert windows and partitioned, plan


def test_scan_property_sparse_ids_and_widths(spark):
    """Hypothesis: the two-level scan must equal the naive cumsum for
    sparse/duplicate-free doc_ids and any bucket width — empty buckets
    and singleton buckets are where offset bookkeeping breaks."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Window
    import bike_analyzer_spark.operators.packing as pk

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        ids=st.sets(
            st.integers(min_value=0, max_value=200), min_size=1, max_size=20
        ),
        counts=st.data(),
        width=st.integers(min_value=1, max_value=64),
    )
    def run(ids, counts, width):
        rows = [
            (i, counts.draw(st.integers(min_value=0, max_value=50)))
            for i in sorted(ids)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        old = pk.SCAN_BUCKET
        pk.SCAN_BUCKET = width
        try:
            got = {
                r.doc_id: r.start_tok
                for r in pk._with_start_tok(docs).collect()
            }
        finally:
            pk.SCAN_BUCKET = old
        w = Window.orderBy("doc_id").rowsBetween(
            Window.unboundedPreceding, -1
        )
        exp = {
            r.doc_id: r.s
            for r in docs.select(
                "doc_id",
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("s"),
            ).collect()
        }
        assert got == exp

    run()
