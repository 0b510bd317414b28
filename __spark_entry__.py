"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bike_analyzer_spark``; this module only
aggregates the per-operator QUERIES/ORACLES registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bike_analyzer_spark.operators import (
    analytics_ext,
    asof,
    assoc,
    classifier,
    curate,
    dedup,
    divergence,
    drift,
    evalsuite,
    experiment,
    funcsuite,
    fuzzy,
    gapfill,
    graph,
    hypertable,
    importance,
    ivf,
    ivfpq,
    kpi,
    layout,
    lm,
    mixing,
    multimodal,
    od,
    packing,
    pq,
    profile,
    quality,
    rangejoin,
    readers,
    retrieval,
    sampling,
    scale,
    scrub,
    semdedup,
    sequences,
    setjoin,
    similarity,
    stats,
    substring,
    text,
    tpch,
    tpch_close,
    useranalytics,
    vocab,
    warehouse_ext,
    windows,
    winfuncs,
)

# Ordering matters: the driver's correctness check records only the
# FIRST 50 queries in registration order, so window slots go to the
# queries with the LEAST driver-graded evidence first.  Round 9
# re-derived the policy streak-0-first (r8 verdict ask #1): the
# window is filled in ascending green-streak order — a query that has
# NEVER been driver-checked (streak 0) outranks a streak-1 query,
# because the window's purpose is maximizing marginal driver
# evidence.  tests/test_rotation.py enforces this as a min-priority-
# prefix invariant over the registration order, deriving streaks from
# the committed CORRECTNESS_r*.json history.  The local oracle suite
# (tests/oracle.py) still runs every query regardless of order.
#
# Manual rotate-backs (edited-module policy, tests/test_rotation.py):
# proven queries whose operators changed materially this round, so
# their historical streaks are not evidence and they re-occupy window
# slots (priority 0) until re-proven.  Empty this round: the r8
# rotate-backs (tpch_pricing_summary, dedup_minhash_lsh,
# dedup_incr_near) all re-proved green in CORRECTNESS_r08; the only
# operator edit in r9 (od_kcore's threshold derivation) belongs to a
# streak-0 query already inside the window.
WINDOW_ROTATEBACKS = frozenset()

# Window overflow (r9): the 50 slots hold the 46 never-driver-checked
# queries (the r8 overflow backlog, drained in full) plus 4 streak-1
# rotate-ins; these streak-1 queries — every one green in
# CORRECTNESS_r08 — queue outside for their second green at r10.
# tests/test_rotation.py asserts this set is EXACTLY the unproven
# (streak<2) queries outside the window.
WINDOW_OVERFLOW = frozenset(
    {
        # warehouse_ext (r8-green, re-enter r10)
        "event_gap_profile",
        "purchase_value_rank",
        "nation_metrics_unpivot",
        "tpch_promo_revenue",
        "dormant_customers",
        "above_avg_orders",
        "cube_type_hour",
        "tpch_customer_distribution",
        "rolling_user_spend",
        "funnel_reconciliation",
        "scd2_user_tiers",
        # tpch wave-3/4 shapes (r8-green)
        "tpch_late_shipment_priority",
        "tpch_shipmode_priority",
        "tpch_parts_supplier_variety",
        "tpch_top_supplier_share",
        "tpch_sales_opportunity",
        "tpch_small_quantity_revenue",
        "tpch_disjunctive_revenue",
        # tpch_close Q2/Q6/Q8/Q9/Q15/Q20/Q21 (r8-green)
        "tpch_forecast_revenue",
        "tpch_min_cost_supplier",
        "tpch_market_share",
        "tpch_product_profit",
        "tpch_top_supplier",
        "tpch_part_promotion",
        "tpch_waiting_suppliers",
        # text / winfuncs / scale / eval / stats / misc (r8-green)
        "text_bpe_encode",
        "text_chunk_plan",
        "purchase_quartiles",
        "user_value_navigation",
        "event_grouping_sets",
        "scale_salted_sums",
        "scale_grid_quantiles",
        "ann_recall_ivf",
        "nbq_confusion",
        "minhash_error_profile",
        "stats_moments",
        "weighted_sample",
        "hypertable_gapfill",
        "cohort_retention",
        "od_triangles",
        "bm25_topk",
        # funcsuite (r8-green) ceded its four rotate-in slots to the
        # four NEW r9 queries (streak 0 outranks streak 1)
        "f_array_ops",
        "f_datetime_ops",
        "f_rank_ties",
        "f_string_ops",
        # NEW in r9 wave 2 (streak 0): the window is already full of
        # streak-0 queries, so these tie-break outside and enter at
        # the r10 rotation
        "winsorized_stats",
        "markov_eval",
        "hll_overlap_estimate",
        # NEW in r9 wave 3 (streak 0): same tie-break, enter at r10
        "type_affinity_cosine",
        "activity_ccf",
        "retention_survival",
        "od_link_prediction",
        "sim_ivfpq_topk",
        "text_readability",
        "f_map_ops",
        "geo_dbscan_clusters",
        "ivf_label_purity",
        "theilsen_trend",
        "scale_salted_join",
        "quantile_error_audit",
        # NEW in r9 wave 6 (streak 0): same tie-break, enter at r10
        "dedup_prefix_filter",
        "dedup_sorted_neighborhood",
        "vocab_heaps_curve",
        "sim_sparse_cosine",
        "kmins_user_estimate",
        "od_label_propagation",
        "dedup_containment",
        "f_struct_ops",
        "seasonal_circular",
        "purchase_value_distribution",
    }
)


class _Slice:
    """A registration-order slice of one module's QUERIES/ORACLES.

    Rotation needs finer granularity than whole modules: by end of
    round 6 all 50 window slots hold unproven queries, so every
    mixed module (kpi, dedup, readers, windows, analytics_ext,
    graph) is sliced — its unproven queries sit inside the window
    while its proven tail rotates out. Queries and oracles are
    untouched; only the registration order changes.
    """

    def __init__(self, mod, names):
        self.QUERIES = {k: mod.QUERIES[k] for k in names}
        self.ORACLES = {
            k: mod.ORACLES[k]
            for k in names
            if k in getattr(mod, "ORACLES", {})
        }


def _split(mod, head_names):
    head = _Slice(mod, head_names)
    tail = _Slice(mod, [k for k in mod.QUERIES if k not in head_names])
    return head, tail


_analytics_head, _analytics_tail = _split(
    analytics_ext,
    ["value_reversals", "skyline_parts", "monthly_revenue_yoy"],
)
_curate_head, _curate_tail = _split(
    curate, ["source_data_card", "corpus_build_card"]
)
_quality_head, _quality_tail = _split(quality, ["ngram_novelty"])
_eval_head, _eval_tail = _split(evalsuite, ["nbq_gains"])
_fuzzy_head, _fuzzy_tail = _split(
    fuzzy, ["entity_clusters", "entity_golden_record"]
)
_graph_head, _graph_tail = _split(
    graph, ["od_reach_hops", "od_kcore", "od_shortest_path"]
)
_graph_ovf = _Slice(graph, ["od_triangles"])
_graph_proven = _Slice(
    graph, ["dedup_clusters", "dedup_clusters_lss", "od_pagerank"]
)
_hyper_head, _hyper_tail = _split(hypertable, ["time_weighted_avg"])
_od_head, _od_tail = _split(od, ["geo_hotspots"])
_profile_head, _profile_tail = _split(
    profile, ["integrity_audit", "skew_report", "event_disorder_profile"]
)
_retrieval_head, _retrieval_tail = _split(retrieval, ["rrf_fusion"])
_scale_head, _scale_tail = _split(
    scale, ["hll_user_estimate", "hll_grouped_estimate"]
)
_scale_ovf = _Slice(scale, ["scale_salted_sums", "scale_grid_quantiles"])
_scale_proven = _Slice(scale, ["cms_user_counts"])
_stats_head, _stats_tail = _split(
    stats, ["robust_outliers", "benford_digits", "metric_correlations"]
)
_sequences_head, _sequences_tail = _split(
    sequences,
    [
        "event_transitions",
        "activity_acf",
        "activity_anova",
        "holt_forecast",
        "path_trigrams",
    ],
)
_scale_new = _Slice(scale, ["hll_overlap_estimate"])
_scale_new2 = _Slice(scale, ["scale_salted_join"])
_scale_new3 = _Slice(scale, ["kmins_user_estimate"])
_assoc_head, _assoc_tail = _split(assoc, ["event_cooccurrence"])
_graph_new = _Slice(graph, ["od_link_prediction"])
_graph_new2 = _Slice(graph, ["od_label_propagation"])
_drift_head, _drift_tail = _split(
    drift, ["cusum_changepoint", "psi_drift", "seasonal_anomalies"]
)
_ua_head, _ua_tail = _split(
    useranalytics,
    [
        "attribution_last_touch",
        "ltv_decay",
        "attribution_delay",
        "dau_wau_stickiness",
        "ordered_funnel",
        "attribution_position",
        "cohort_ltv",
        "rfm_segments",
        "weekly_conversion_ci",
        "web_order_bridge",
    ],
)
_vocab_head, _vocab_tail = _split(
    vocab, ["vocab_bigram_pmi", "vocab_zipf_fit"]
)
_wx_head, _wx_tail = _split(
    warehouse_ext,
    ["fulfillment_latency", "basket_size_profile", "revenue_pareto"],
)
_tpch_ovf = _Slice(
    tpch,
    [
        "tpch_late_shipment_priority",
        "tpch_shipmode_priority",
        "tpch_parts_supplier_variety",
        "tpch_top_supplier_share",
        "tpch_sales_opportunity",
        "tpch_small_quantity_revenue",
        "tpch_disjunctive_revenue",
    ],
)
_tpch_proven = _Slice(
    tpch,
    [
        "tpch_pricing_summary",
        "tpch_shipping_priority",
        "tpch_regional_revenue",
        "tpch_returned_items",
        "tpch_large_volume",
        "tpch_volume_shipping",
    ],
)
_text_ovf = _Slice(text, ["text_bpe_encode", "text_chunk_plan"])
_text_new = _Slice(text, ["text_readability"])
_text_proven = _Slice(
    text,
    ["text_stats", "text_langid", "text_fingerprint", "text_bpe_tokens"],
)
_sampling_ovf = _Slice(sampling, ["weighted_sample"])
_sampling_proven = _Slice(
    sampling, ["split_assign", "split_summary", "stratified_sample"]
)

_MODULES = [
    # ---- r9 window (exactly 50 queries, streak-0-first) ---------
    # The full 46-query r8 WINDOW_OVERFLOW backlog — every query
    # that has NEVER appeared in a driver CORRECTNESS artifact —
    # drains into the window in one round, plus the four queries NEW
    # in r9 (corpus_build_card, ngram_novelty, revenue_pareto,
    # event_disorder_profile — streak 0 outranks the streak-1
    # rotate-in candidates). Slot arithmetic: useranalytics 10 +
    # sequences 5 + graph 3 + stats 3 + drift 3 + analytics_ext 3 +
    # profile 3 (+disorder) + warehouse_ext 3 (+pareto) + divergence
    # 2 + fuzzy 2 + scale(hll) 2 + vocab 2 + curate 2 (+build card)
    # + quality 1 (novelty) + assoc 1 + evalsuite 1 + experiment 1 +
    # hypertable 1 + od 1 + retrieval 1 = 50.
    _ua_head,  # attribution / LTV / RFM / funnels / stickiness / CI
    _sequences_head,  # transitions, ACF, ANOVA, Holt, trigrams
    _graph_head,  # BFS reach, k-core, Bellman-Ford shortest path
    _stats_head,  # robust MAD outliers, Benford, correlations
    _drift_head,  # CUSUM changepoint, PSI, seasonal anomalies
    _analytics_head,  # reversals, skyline, YoY
    divergence,  # per-source entropy, pairwise JSD
    _fuzzy_head,  # entity resolution clusters + golden record
    _profile_head,  # integrity audit, skew report
    _scale_head,  # HLL per-user + grouped reach estimates
    _vocab_head,  # bigram PMI, Zipf fit
    _wx_head,  # fulfillment latency, basket size profile
    _assoc_head,  # event co-occurrence lift
    _curate_head,  # source data card
    _eval_head,  # nbq_gains calibration
    experiment,  # chi-square A/B
    _hyper_head,  # TWAP time-weighted average
    _od_head,  # Getis-Ord geo hotspots
    _retrieval_head,  # RRF hybrid fusion
    _quality_head,  # NEW r9: first-occurrence n-gram novelty
    # ---- outside the window: the 45 streak-1 queries ------------
    # ALL r8-green, queued in WINDOW_OVERFLOW to re-enter at r10
    # for their second green.
    _wx_tail,
    _tpch_ovf,
    tpch_close,
    winfuncs,
    funcsuite,
    _text_ovf,
    _scale_ovf,
    _eval_tail,
    _stats_tail,
    _sampling_ovf,
    gapfill,
    _ua_tail,
    _graph_ovf,
    _retrieval_tail,
    _sequences_tail,  # NEW r9 wave 2: markov_eval (streak 0, outside)
    _scale_new,  # NEW r9 wave 2: hll_overlap_estimate (streak 0, outside)
    _assoc_tail,  # NEW r9 wave 3: type_affinity_cosine (streak 0, outside)
    _graph_new,  # NEW r9 wave 3: od_link_prediction (streak 0, outside)
    ivfpq,  # NEW r9 wave 4: composed IVF-PQ ANN (streak 0, outside)
    _text_new,  # NEW r9 wave 4: FORCAST readability (streak 0, outside)
    _scale_new2,  # NEW r9 wave 5: salted-join rollup (streak 0, outside)
    setjoin,  # NEW r9 wave 6: prefix-filter + SNM set-similarity joins
    _scale_new3,  # NEW r9 wave 7: k-mins cardinality sketch (streak 0)
    _graph_new2,  # NEW r9 wave 8: synchronous LPA communities (streak 0)
    _drift_tail,  # NEW r9 wave 11: circular seasonality (streak 0)
    # ---- proven tail (every query ≥2 consecutive driver greens) --
    multimodal,
    similarity,
    ivf,
    ivfpq,
    pq,
    dedup,
    _quality_tail,
    _sampling_proven,
    _curate_tail,
    semdedup,
    importance,
    lm,
    mixing,
    packing,
    scrub,
    _tpch_proven,
    classifier,
    layout,
    substring,
    _vocab_tail,
    _fuzzy_tail,
    _profile_tail,
    rangejoin,
    _hyper_tail,
    asof,
    _od_tail,
    windows,
    readers,
    _analytics_tail,
    _graph_proven,
    _scale_proven,
    _text_proven,
    kpi,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Top-10 value-to-balance ratio: exercises the latest-snapshot
    scalar max, broadcast dim join, null-guarded rounded ratio, and
    deterministic top-k (reference sql/queries.sql:16-31).
    """
    return kpi.q2_top10_value_ratio(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(getattr(m, "ORACLES", {}))
    return out
