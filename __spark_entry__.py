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
    funnels,
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
    streamserve,
    substring,
    text,
    tpch,
    tpch_close,
    useranalytics,
    vocab,
    warehouse_ext,
    windows,
    winfuncs,
    winnow,
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
# slots (priority 0) until re-proven.  Empty this round: the only r9
# operator edit (od_kcore) re-proved green in CORRECTNESS_r09.
WINDOW_ROTATEBACKS = frozenset()

# Window overflow (r13): empty — the backlog is drained.  After
# CORRECTNESS_r12 (50/50 green) exactly 27 queries hold streak 1:
# the 25 that queued outside the r12 window (20 r10-window
# first-greens + 5 r11 first-greens) plus the 2 r12-new queries
# (sim_cosine_threshold, rollup_partials_merge).  All 27 fit inside
# the 50-slot r13 window, so the streak-2 completion horizon lands
# this round: after CORRECTNESS_r13 every one of the 230 queries has
# ≥2 driver greens.  The remaining 23 slots go to proven (streak ≥2)
# queries in the existing registration order — ties may cross the
# window boundary (tests/test_rotation.py).
WINDOW_OVERFLOW = frozenset()


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
_quality_head = _Slice(quality, ["ngram_novelty"])
_quality_new = _Slice(quality, ["source_overlap_matrix"])
_quality_tail = _Slice(
    quality,
    [
        "text_quality_rules",
        "text_repetition",
        "decontam_overlap",
        "tfidf_top_terms",
    ],
)
_eval_head = _Slice(evalsuite, ["nbq_gains"])
_eval_new = _Slice(evalsuite, ["ivf_label_purity", "quantile_error_audit"])
_eval_probe = _Slice(evalsuite, ["ann_probe_curve"])
_eval_ovf = _Slice(
    evalsuite, ["ann_recall_ivf", "nbq_confusion", "minhash_error_profile"]
)
_fuzzy_head, _fuzzy_tail = _split(
    fuzzy, ["entity_clusters", "entity_golden_record"]
)
_graph_head, _graph_tail = _split(
    graph, ["od_reach_hops", "od_kcore", "od_shortest_path"]
)
_graph_head_a = _Slice(graph, ["od_reach_hops"])
_graph_head_b = _Slice(graph, ["od_kcore", "od_shortest_path"])
_graph_ovf = _Slice(graph, ["od_triangles"])
_graph_proven = _Slice(
    graph, ["dedup_clusters", "dedup_clusters_lss", "od_pagerank"]
)
_hyper_head, _hyper_tail = _split(hypertable, ["time_weighted_avg"])
_od_head = _Slice(od, ["geo_hotspots"])
_od_new = _Slice(od, ["geo_dbscan_clusters"])
_od_proven = _Slice(
    od, ["od_flows_topn", "od_flow_conservation", "od_flows_with_coords"]
)
_profile_head, _profile_tail = _split(
    profile, ["integrity_audit", "skew_report", "event_disorder_profile"]
)
_retrieval_head, _retrieval_tail = _split(retrieval, ["rrf_fusion"])
_scale_head, _scale_tail = _split(
    scale, ["hll_user_estimate", "hll_grouped_estimate"]
)
_scale_ovf = _Slice(scale, ["scale_salted_sums", "scale_grid_quantiles"])
_scale_proven = _Slice(scale, ["cms_user_counts"])
_stats_head2 = _Slice(
    stats, ["robust_outliers", "benford_digits", "metric_correlations"]
)
_stats_new = _Slice(stats, ["winsorized_stats", "theilsen_trend"])
_stats_ovf = _Slice(stats, ["stats_moments"])
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
_scale_new4 = _Slice(scale, ["cms_join_size"])
_scale_new5 = _Slice(scale, ["bloom_join_prune"])
_scale_new6 = _Slice(scale, ["hll_sliding_reach"])
_setjoin_new, _setjoin_tail = _split(setjoin, ["sim_cosine_threshold"])
_streamserve_new, _streamserve_tail = _split(
    streamserve, ["rollup_partials_merge"]
)
_sim_new = _Slice(similarity, ["sim_mutual_nn"])
_sim_proven = _Slice(
    similarity,
    [
        "sim_topk_bruteforce",
        "sim_lsh_buckets",
        "sim_lsh_candidates",
        "dedup_embed_cosine",
    ],
)
_assoc_head, _assoc_tail = _split(assoc, ["event_cooccurrence"])
_experiment_head = _Slice(experiment, ["ab_test_chi2"])
_experiment_new = _Slice(experiment, ["ab_cuped_readout"])
_graph_new = _Slice(graph, ["od_link_prediction"])
_graph_new2 = _Slice(graph, ["od_label_propagation"])
_drift_head, _drift_tail = _split(
    drift, ["cusum_changepoint", "psi_drift", "seasonal_anomalies"]
)
_ua_head = _Slice(
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
_ua_new = _Slice(useranalytics, ["retention_survival"])
_ua_ovf = _Slice(useranalytics, ["cohort_retention"])
_vocab_head = _Slice(vocab, ["vocab_bigram_pmi", "vocab_zipf_fit"])
_vocab_new = _Slice(vocab, ["vocab_heaps_curve"])
_vocab_proven = _Slice(vocab, ["vocab_summary", "vocab_top_terms"])
_lm_new, _lm_proven = _split(lm, ["lm_kn_doc_bits"])
_winfuncs_new = _Slice(winfuncs, ["purchase_value_distribution"])
_winfuncs_ovf = _Slice(
    winfuncs,
    ["purchase_quartiles", "user_value_navigation", "event_grouping_sets"],
)
_funcsuite_new = _Slice(funcsuite, ["f_map_ops", "f_struct_ops"])
_funcsuite_ovf = _Slice(
    funcsuite,
    ["f_array_ops", "f_datetime_ops", "f_rank_ties", "f_string_ops"],
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
    ],
)
_tpch_ovf2 = _Slice(
    tpch, ["tpch_small_quantity_revenue", "tpch_disjunctive_revenue"]
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
_tpch_close_ovf = _Slice(
    tpch_close,
    [
        "tpch_forecast_revenue",
        "tpch_min_cost_supplier",
        "tpch_market_share",
        "tpch_product_profit",
        "tpch_top_supplier",
        "tpch_part_promotion",
        "tpch_waiting_suppliers",
    ],
)

_MODULES = [
    # ---- r13 window (first 50 queries) ----------------------------
    # The 27 streak-1 queries seat first (priority 1 < proven 2):
    # the 2 r12-new queries, the 20 r10-window first-greens that
    # queued outside the r12 window, and the 5 r11 first-greens.
    # The remaining 23 slots fall to proven queries in the prior
    # registration order (graph 2 + stats 3 + drift 3 + analytics 3 +
    # divergence 2 + fuzzy 2 + profile 3 + scale 2 + vocab 2 +
    # warehouse_ext 1) — after CORRECTNESS_r13 every query is ≥2
    # driver greens and rotation pressure is gone.
    _setjoin_new,  # r12-new: lossless tau-gated AllPairs cosine join
    _streamserve_new,  # r12-new: serve-path partial-merge law twin
    # ...the 20 r10-window first-greens completing streak 2:
    _text_new,  # FORCAST readability
    _scale_new2,  # salted skew-proof join rollup
    _setjoin_tail,  # prefix-filter/SNM/sparse-cosine/containment joins
    _scale_new3,  # k-mins cardinality sketch
    _graph_new2,  # synchronous label-propagation communities
    _drift_tail,  # circular seasonality
    _vocab_new,  # Heaps-law vocab growth curve
    _od_new,  # grid-density DBSCAN
    funnels,  # right/full-outer interval-join batch twins + strict seq
    winnow,  # winnowing (MOSS) fingerprint dedup
    _experiment_new,  # CUPED variance-reduced A/B readout
    _quality_new,  # cross-source contamination matrix
    _scale_new4,  # CMS inner-product join-size estimate
    _scale_new5,  # Bloom semi-join pruning audit
    _sim_new,  # mutual nearest neighbors (reciprocal top-1)
    # ...the 5 r11 first-greens completing streak 2:
    _streamserve_tail,  # streaming-serve batch twins (r11)
    _lm_new,  # interpolated Kneser-Ney bigram LM scoring (r11)
    _scale_new6,  # sliding-window HLL trailing reach (r11)
    _eval_probe,  # IVF probe-budget routing-coverage curve (r11)
    # ...proven queries fill the remaining 23 slots:
    _graph_head_b,
    _stats_head2,
    _drift_head,
    _analytics_head,
    divergence,
    _fuzzy_head,
    _profile_head,
    _scale_head,
    _vocab_head,
    _wx_head,
    _assoc_head,
    _curate_head,
    _eval_head,
    _experiment_head,
    _hyper_head,
    _od_head,
    _retrieval_head,
    _quality_head,
    _winfuncs_new,  # percent_rank/cume_dist value distribution
    _funcsuite_new,  # MAP + STRUCT function suites
    _eval_new,  # IVF cluster purity, quantile-sketch error audit
    _stats_new,  # winsorized stats, Theil-Sen robust trend
    _ua_new,  # Kaplan-Meier retention survival
    _sequences_tail,  # Markov holdout eval, lagged CCF
    _scale_new,  # HLL audience overlap (union/intersection)
    _assoc_tail,  # type-affinity cosine
    _graph_new,  # Adamic-Adar link prediction
    ivfpq,  # composed IVF-PQ ANN top-k
    # ---- proven tail (every query ≥2 driver greens) --------------
    _tpch_ovf2,
    _tpch_close_ovf,
    _text_ovf,
    _winfuncs_ovf,
    _funcsuite_ovf,
    _scale_ovf,
    _eval_ovf,
    _stats_ovf,
    _sampling_ovf,
    gapfill,
    _ua_ovf,
    _graph_ovf,
    _retrieval_tail,
    _ua_head,
    _sequences_head,
    _graph_head_a,
    _wx_tail,
    _tpch_ovf,
    multimodal,
    _sim_proven,
    ivf,
    pq,
    dedup,
    _quality_tail,
    _sampling_proven,
    _curate_tail,
    semdedup,
    importance,
    _lm_proven,
    mixing,
    packing,
    scrub,
    _tpch_proven,
    classifier,
    layout,
    substring,
    _vocab_proven,
    _fuzzy_tail,
    _profile_tail,
    rangejoin,
    _hyper_tail,
    asof,
    _od_proven,
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
