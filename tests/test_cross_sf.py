"""Oracle agreement must hold at MULTIPLE scale factors — a query that
only matches at sf0.01 has a size-dependent bug (broadcast assumption,
limit interaction, empty-group edge case)."""

import pytest

from bike_analyzer_spark.operators import (
    classifier,
    curate,
    graph,
    profile,
    quality,
    retrieval,
    scale,
    sequences,
    stats,
    warehouse_ext,
    dedup,
    fuzzy,
    importance,
    kpi,
    layout,
    lm,
    mixing,
    packing,
    scrub,
    semdedup,
    substring,
    text,
    tpch,
    vocab,
    windows,
)
from tests.conftest import SF_DIR_SMOKE, make_duck
from tests.oracle import assert_matches_oracle

CASES = [
    (kpi, "q1_network_summary"),
    (kpi, "q2_top10_value_ratio"),
    (kpi, "f_scalar_suite"),
    (windows, "w1_lag_delta"),
    (windows, "a11_top20_by_nation"),
    (text, "text_stats"),
    # round-6 additions: their thresholds/buckets/splits are the kind
    # of thing that only breaks when the corpus size changes
    (packing, "pack_summary"),
    (mixing, "mix_weights"),
    (lm, "lm_doc_bits"),
    (scrub, "scrub_report"),
    (dedup, "dedup_incr_near"),
    (semdedup, "semdedup_summary"),
    (importance, "dsir_select"),
    (substring, "span_top_shared"),
    (vocab, "vocab_summary"),
    (fuzzy, "fuzzy_pairs"),
    # round-6 second wave: money sums, classifier calibration bar,
    # layout grid normalization, and range-frame contents all shift
    # with corpus size
    (tpch, "tpch_pricing_summary"),
    (tpch, "tpch_regional_revenue"),
    (classifier, "nbq_select"),
    (layout, "zorder_layout_stats"),
    (windows, "w4_sliding_hour_avg"),
    # round-8 additions: idf/threshold/interval math derives from the
    # corpus (df counts, per-part averages, tier streaks, quantile
    # ranks) — exactly the class that only breaks when size changes
    (retrieval, "bm25_topk"),
    (graph, "od_triangles"),
    (scale, "scale_grid_quantiles"),
    (scale, "scale_salted_sums"),
    (text, "text_bpe_encode"),
    (tpch, "tpch_top_supplier_share"),
    (tpch, "tpch_sales_opportunity"),
    (tpch, "tpch_small_quantity_revenue"),
    (tpch, "tpch_disjunctive_revenue"),
    (warehouse_ext, "scd2_user_tiers"),
    (warehouse_ext, "rolling_user_spend"),
    (warehouse_ext, "funnel_reconciliation"),
    # round-9 additions: every constant here derives from corpus
    # size (split midpoints, rank cuts, Pareto thresholds, funnel
    # counts, novelty ownership) — exactly the class a third SF
    # catches
    (curate, "corpus_build_card"),
    (quality, "ngram_novelty"),
    (warehouse_ext, "revenue_pareto"),
    (profile, "event_disorder_profile"),
    (stats, "winsorized_stats"),
    (sequences, "markov_eval"),
    (scale, "hll_overlap_estimate"),
]

@pytest.fixture(scope="module")
def duck_smoke():
    con = make_duck(SF_DIR_SMOKE)
    yield con
    con.close()

@pytest.mark.parametrize("mod,name", CASES, ids=[n for _, n in CASES])
def test_oracle_at_sf0001(spark, duck_smoke, mod, name):
    df = mod.QUERIES[name](spark, SF_DIR_SMOKE)
    assert_matches_oracle(df, duck_smoke, mod.ORACLES[name], name=name)
