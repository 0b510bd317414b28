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
# FIRST 50 queries in registration order, so the newest / least
# driver-proven modules go first (round-3 verdict: graph..scale were
# silently outside the window).  Long-stable two-round-green modules
# rotate to the back; the local oracle suite (tests/oracle.py) still
# runs every query regardless of order.  The invariant "every query
# with <2 consecutive driver-green rounds sits inside the window" is
# ENFORCED by tests/test_rotation.py, which derives green streaks
# from the CORRECTNESS_r*.json history.
# Manual rotate-backs (edited-module policy, tests/test_rotation.py):
# proven queries whose operators changed materially this round, so
# their historical streaks are not evidence and they re-occupy window
# slots until re-proven.
WINDOW_ROTATEBACKS = frozenset(
    {
        "tpch_pricing_summary",  # sum_charge → DECIMAL(38,0) accumulate
        "dedup_minhash_lsh",  # XOR-scrambled minhash family
        "dedup_incr_near",  # verify stage reuses the store index
    }
)

# Window overflow (r8): every one of the 50 slots is held by a query
# that MUST be there (streak <2, or a rotate-back above), so these
# streak-0 newcomers queue outside until the r9 rotation frees slots.
# tests/test_rotation.py verifies both facts — overflow may only be
# declared while the window is provably full of must-stay queries.
WINDOW_OVERFLOW = frozenset(
    {
        "domain_entropy",
        "domain_jsd_pairs",
        "event_transitions",
        "activity_acf",
        "od_reach_hops",
        "rrf_fusion",
        "cusum_changepoint",
        "psi_drift",
        "robust_outliers",
        "attribution_last_touch",
        "source_data_card",
        "activity_anova",
        "entity_clusters",
        "integrity_audit",
        "ltv_decay",
        "skew_report",
        "value_reversals",
        "od_kcore",
        "attribution_delay",
        "ab_test_chi2",
        "event_cooccurrence",
        "vocab_bigram_pmi",
        "od_shortest_path",
        "dau_wau_stickiness",
        "ordered_funnel",
        "time_weighted_avg",
        "nbq_gains",
        "holt_forecast",
        "geo_hotspots",
        "attribution_position",
        "cohort_ltv",
        "skyline_parts",
        "path_trigrams",
        "hll_user_estimate",
        "benford_digits",
        "entity_golden_record",
        "rfm_segments",
        "monthly_revenue_yoy",
        "fulfillment_latency",
        "vocab_zipf_fit",
        "seasonal_anomalies",
        "metric_correlations",
        "weekly_conversion_ci",
        "basket_size_profile",
        "web_order_bridge",
        "hll_grouped_estimate",
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


_tpch_head, _tpch_tail = _split(
    tpch,
    [
        # 1-streak (new in r7) — must stay until 2-streak
        "tpch_large_volume",
        "tpch_volume_shipping",
        # edited r8 (sum_charge now accumulates DECIMAL(38,0) and
        # displays via the 128-bit half-up) — manual rotate-back per
        # the edited-module policy in tests/test_rotation.py
        "tpch_pricing_summary",
        # NEW in r8 (streak 0): Q4/Q12/Q16/Q11/Q17/Q19/Q22 shapes
        "tpch_late_shipment_priority",
        "tpch_shipmode_priority",
        "tpch_parts_supplier_variety",
        "tpch_top_supplier_share",
        "tpch_sales_opportunity",
        "tpch_small_quantity_revenue",
        "tpch_disjunctive_revenue",
    ],
)
_dedup_head, _dedup_tail = _split(
    dedup,
    [
        "dedup_incr_near",
        # edited r8 (XOR-scrambled minhash family — candidates and
        # verified pairs change) — manual rotate-back per the
        # edited-module policy in tests/test_rotation.py
        "dedup_minhash_lsh",
    ],
)
_scale_head, _scale_tail = _split(
    scale, ["scale_salted_sums", "scale_grid_quantiles"]
)
_graph_head, _graph_tail = _split(graph, ["od_triangles"])
_retrieval_head, _retrieval_tail = _split(retrieval, ["bm25_topk"])
_stats_head, _stats_tail = _split(stats, ["stats_moments"])
_useranalytics_head, _useranalytics_tail = _split(
    useranalytics, ["cohort_retention"]
)
_semdedup_head, _semdedup_tail = _split(semdedup, ["semdedup_keep"])
_sim_head, _sim_tail = _split(similarity, ["sim_topk_bruteforce"])
_sampling_head, _sampling_tail = _split(sampling, ["weighted_sample"])
_text_head, _text_tail = _split(
    text, ["text_bpe_encode", "text_chunk_plan"]
)
_eval_head, _eval_tail = _split(
    evalsuite, ["ann_recall_ivf", "nbq_confusion", "minhash_error_profile"]
)
_wx_head, _wx_tail = _split(
    warehouse_ext,
    [
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
    ],
)

_MODULES = [
    # ---- r8 window (exactly 50 queries) -------------------------
    # The entire r6 cohort reached 2-streak when the r7 greens
    # landed, freeing 48 slots. They host: the seven staged
    # warehouse_ext queries (built+oracle-gated in r7, registered
    # now), the three NEW r8 queries (text_bpe_encode and the two
    # scale promotions), the three tpch head queries above, the
    # r8-edited dedup_incr_near (verify-stage rework), and 34
    # re-proof slots for the strongest local-only families — mm_*,
    # sim_* (ivf/pq/lsh/brute), text, quality, sampling, curate,
    # cms — none of which have been driver-checked since round 5's
    # spread-read change. Slot arithmetic:
    #   warehouse_ext 10 + tpch 10 + text 5 + scale 3 + multimodal 4
    #   + similarity 4 + ivf 2 + pq 2 + quality 4 + sampling 3
    #   + dedup_incr 1 + od_triangles 1 + bm25 1 = 50
    # (the late wave-4 additions — Q17/Q19/scd2 — displaced the last
    # three r7-window holdovers (semdedup_keep, dsir_weights,
    # curate_keep_list), so NO r8-window query repeats from r7.)
    # (lm/mixing/packing/scrub — 2-streak with their latest green IN
    # round 7, i.e. already driver-proven post-spread-read — ceded
    # their re-proof slots to the seven NEW r8 wave-3 queries: five
    # tpch shapes + rolling_user_spend + funnel_reconciliation.)
    _wx_head,
    _tpch_head,
    _text_head,  # text_bpe_encode (streak 0); the module's four
    # 4-streak queries ceded their re-proof slots to winfuncs +
    # weighted_sample below
    winfuncs,  # NEW r8 wave 7 (streak 0): ntile / navigation trio /
    # GROUPING SETS
    _scale_head,  # (cms_user_counts, 2-streak, ceded its slot to
    # the rotated-back dedup_minhash_lsh below)
    _eval_head,  # NEW r8 wave 6 (streak 0): recall/calibration/error
    # (evalsuite's three slots came from ivf + the similarity head —
    # ann_recall_ivf's oracle replays BOTH operators' full DuckDB
    # twins (unrolled Lloyd included) and intersects their outputs,
    # so those pipelines stay driver-gated through the eval query.
    # pq (2-streak, driver-proven r5+r6) ceded its pair of slots to
    # warehouse_ext's nation_metrics_unpivot + window headroom.)
    _stats_head,  # NEW r8 wave 10 (streak 0): exact-moment stddev/corr/OLS
    funcsuite,  # NEW r8 wave 9 (streak 0): array/datetime/rank/string
    # suites. Wave-9/10 slot arithmetic: quality's four 2-streak
    # queries (incl. the decontam_overlap re-proof — r7-green post
    # spread-read, module untouched in r8) + sampling's three
    # 2-streak queries (split_assign / split_summary /
    # stratified_sample, driver-green r6+r7) ceded seven slots to
    # funcsuite (4), stats_moments, hypertable_gapfill, and
    # cohort_retention.
    _sampling_head,  # weighted_sample (streak 0)
    gapfill,  # NEW r8 wave 9 (streak 0): time_bucket_gapfill shape
    _useranalytics_head,  # NEW r8 wave 9 (streak 0): cohort retention
    _dedup_head,
    _graph_head,  # NEW r8: od_triangles (streak 0)
    _retrieval_head,  # NEW r8: bm25_topk (streak 0)
    tpch_close,  # NEW r8 wave 5 (streak 0): Q2/Q6/Q8/Q9/Q15/Q20/Q21
    # (tpch_close's seven slots came from multimodal (4) and the
    # similarity tail (3) — all streak ≥3, none in the r7 window,
    # and every one re-verified this session by the full local
    # sf0.01+sf0.1 Spark-vs-DuckDB sweep, so the NEW TPC-H shapes
    # take the driver slots instead of a third re-proof pass.)
    # ---- outside the window (every query ≥2 consecutive driver
    # greens, modules untouched this round) -----------------------
    multimodal,
    _sim_head,
    _sim_tail,
    ivf,
    pq,
    _scale_tail,
    _text_tail,
    divergence,  # NEW r8 wave 11 (streak 0, outside: the window is
    # full with streak-0/1 queries; enters on r9 rotation)
    sequences,  # NEW r8 wave 12 (streak 0, outside — same reason)
    _retrieval_tail,  # NEW r8 wave 12: rrf_fusion (streak 0, outside)
    drift,  # NEW r8 wave 12: cusum/psi (streak 0, outside)
    _stats_tail,  # NEW r8 wave 13: robust MAD outliers (streak 0, outside)
    _useranalytics_tail,  # NEW r8 wave 13: attribution (streak 0, outside)
    experiment,  # NEW r8 wave 14: chi-square A/B (streak 0, outside)
    assoc,  # NEW r8 wave 14: basket co-occurrence (streak 0, outside)
    _eval_tail,  # NEW r8 wave 15: nbq_gains (streak 0, outside)
    _wx_tail,  # NEW r8 wave 16: fulfillment_latency (streak 0, outside)
    quality,
    _sampling_tail,
    curate,
    _semdedup_head,
    importance,
    lm,
    mixing,
    packing,
    scrub,
    _tpch_tail,
    classifier,
    layout,
    substring,
    vocab,
    fuzzy,
    profile,
    rangejoin,
    hypertable,
    asof,
    od,
    windows,
    readers,
    analytics_ext,
    _semdedup_tail,
    _graph_tail,
    _dedup_tail,
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
