"""Whole-corpus physical-plan audit — every registered query, every
round, WITHOUT executing anything (sparkPlan is the pre-AQE physical
plan; building it costs analysis+planning only).

Three engine-wide invariants:

* no `BatchEvalPython` anywhere — that node is the row-at-a-time
  (pickled) Python UDF path; every sanctioned Python boundary in this
  engine is Arrow-batched (`MapInPandas` / `ArrowEvalPython`).
* no unbounded Cartesian product — `CartesianProduct` never, and
  `BroadcastNestedLoopJoin` only where a query deliberately
  cross-joins a documented BOUNDED broadcast frame (1-row aggregates,
  centroid rows, Bloom word tables, cut frames); those queries are
  listed explicitly so a new unbounded cross join cannot hide behind
  the allowance.
* no `Window` with an EMPTY partition spec over an entity-keyed frame
  — a global window funnels its entire input through ONE task (r8
  found one instance by hand: od_kcore's degree threshold, fixed in
  516022e; this audit makes the class unrepresentable). Queries whose
  plans legitimately hold a global window over a BOUNDED frame (hour
  grids, band/decile lattices, count-of-count histograms, salted
  top-N stage-2 survivors) are allowlisted by name with the bounded
  frame spelled out.
"""

import os
import re

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR_ORACLE

#: queries whose plans legitimately contain BroadcastNestedLoopJoin —
#: each cross-joins a BOUNDED broadcast side (1-row aggregate /
#: centroid row / cuts frame), never a corpus
_BOUNDED_CROSSJOIN_OK = {
    "q1_network_summary",
    "q4_hourly_correlation",
    "a2_time_bounds",
    "f_scalar_suite",
    "w3_latest_snapshot",
    "sim_ivf_assign",
    "sim_ivf_topk",
    "semdedup_keep",
    "semdedup_summary",
    "sim_pq_encode",
    "sim_pq_topk",
    # the same two 1-row broadcasts its parents carry: the centroid
    # row (ivf) + the codebook row (pq)
    "sim_ivfpq_topk",
    "dsir_weights",
    "dsir_select",
    "lm_doc_bits",
    "lm_bucket_counts",
    # 1-row broadcast: the distinct-bigram-type count the KN
    # continuation probability normalizes by
    "lm_kn_doc_bits",
    # two broadcast range joins against the ≤|days|-row day lattice
    # (calendar-bounded): the trailing-window register merge and the
    # exact-twin distinct-(day,user) window count
    "hll_sliding_reach",
    # the parents' 1-row centroid-array broadcasts (assignment fold
    # + per-query probe ranking), same allowance as sim_ivf_*
    "ann_probe_curve",
    "nbq_model",
    "nbq_select",
    "mix_weights",
    "mix_resample",
    "curate_keep_list",
    "decontam_overlap",
    "pack_assign",
    "pack_summary",
    "value_percentiles",
    "dedup_incr_near",
    "vocab_summary",
    "span_dedup_stats",
    "span_top_shared",
    "od_pagerank",
    # the same 1-row n_docs broadcast sim_sparse_cosine carries (the
    # IDF denominator); candidates and verify are equi-joins
    "sim_cosine_threshold",
    # 1-row broadcast scalars: the temporal split midpoint / the
    # exact-overlap count (r9)
    "markov_eval",
    "hll_overlap_estimate",
    # 1-row min/max bounds frames for grid math
    "zorder_layout_stats",
    "asof_hourly_stats",
    # 1-row corpus totals (IDF / frequency denominators)
    "vocab_top_terms",
    "tfidf_top_terms",
    # 1-row corpus ln-total frame joined onto the |sources|-row sums
    "domain_entropy",
    # 1-row series-bounds frame joined onto the hourly series
    "activity_acf",
    # 1-row bounds + two 1-row series-total frames onto the K+1 lags
    "activity_ccf",
    # the 1-row corpus-horizon frame broadcast onto the per-user frame
    "retention_survival",
    # the DAYS^2-bounded pairwise-slope inequality join + two 1-row
    # scalar frames (base day, OLS sums) — calendar-bounded, never
    # corpus-sized
    "theilsen_trend",
    # the 3-row quantile lattice broadcast against the cents-domain
    # histogram (rank inequality), plus grid_quantiles' own 1-row
    # bounds frame
    "quantile_error_audit",
    # 1-row corpus-moments frame onto the <=24-row group stats
    "activity_anova",
    # the 1-row doc-count frame broadcast onto the vocabulary-sized
    # first-doc aggregate and the 10-row decile lattice (r9)
    "vocab_heaps_curve",
    # the KMINS_M(=16)-row bucket lattice broadcast onto the distinct
    # event types (empty-bucket fill for the k-mins sketch, r9)
    "kmins_user_estimate",
    # bm25's 1-row stats frame + the 1-row dense query vector
    "rrf_fusion",
    # 1-row bounds / midpoint / totals frames over bounded series
    "cusum_changepoint",
    "psi_drift",
    # 1-row total-revenue frame onto the |channels|-row rollup
    "attribution_last_touch",
    # per-relationship 1-row null/orphan/total frames assembled
    "integrity_audit",
    # the 1-row corpus-max anchor broadcast over the event scan
    "ltv_decay",
    # the 1-row degree-threshold frame broadcast into each peel round
    "od_kcore",
    # bounded query set broadcast against the corpus — the brute-force
    # ANN baseline's documented shape
    "sim_topk_bruteforce",
    # 1-row global-scalar frames (corpus totals / positive-balance
    # average) cross-joined back over a rollup — Q11/Q22 shapes
    "tpch_top_supplier_share",
    "tpch_sales_opportunity",
    # 1-row corpus-stats frame (N, token total, per-term df/idf)
    # broadcast over the per-doc scoring projection
    "bm25_topk",
    # 1-row quarterly-max frame over the supplier rollup — Q15 shape
    "tpch_top_supplier",
    # eval queries INHERIT the bounded broadcasts of the operators
    # they wrap: the ANN recall runs sim_ivf_topk + the brute-force
    # baseline (both above); the confusion matrix runs nbq_select's
    # 1-row params crossJoin
    "ann_recall_ivf",
    "nbq_confusion",
    # inherits nbq_select's 1-row params crossJoin (same as above)
    "nbq_gains",
    # 1-row totals frames: (n_users, total_c) over the user frame /
    # (n_baskets) over the pair table / (T, B) over the bigram table
    "ab_test_chi2",
    # 1-row time-midpoint bound over the scan + 1-row pooled-moments
    # frame onto the 2-row arm rollup (r10)
    "ab_cuped_readout",
    # 1-row sketch-estimate frames crossed with 1-row exact-size
    # frames (two audited joins, four 1-row frames total, r10)
    "cms_join_size",
    # 1-row probe-total / member-count / pass-count stat frames
    # assembled into the single audit row (r10)
    "bloom_join_prune",
    "event_cooccurrence",
    "vocab_bigram_pmi",
    # 1-row observed-day-bounds frame generating the calendar spine
    "dau_wau_stickiness",
    # 1-row corpus-moments frame onto the <=100x100 cell grid
    "geo_hotspots",
    # 1-row total-credited-revenue frame onto the |channels| rollup
    "attribution_position",
    # 1-row trigram-total / exact-count frames onto bounded rollups
    "path_trigrams",
    "hll_user_estimate",
    # 1-row purchase-total frame onto the 9-digit rollup
    "benford_digits",
    # two chained 1-row corpus-threshold frames over the user frame
    "rfm_segments",
    # 1-row residual-moments frame onto the bounded hours frame
    "seasonal_anomalies",
    # 1-row hour-bounds frame generating the dense type x hour grid
    "metric_correlations",
}


#: queries whose plans legitimately contain a Window with an empty
#: partition spec — each runs over a BOUNDED frame, never the corpus
_BOUNDED_GLOBAL_WINDOW_OK = {
    # calendar-bounded frames: day/hour grids and their running sums
    "retention_survival",  # day-grid survival cum-product
    "cusum_changepoint",  # hour-grid CUSUM running sums
    "busy_islands",  # hour-grid island numbering
    "range_join_busy",  # same hour-grid rank as busy_islands
    "theilsen_trend",  # DAYS^2-bounded slope-pair median rank
    # constant lattices (sizes fixed by module constants)
    "vocab_heaps_curve",  # 10-row decile lattice cum-sum
    "nbq_gains",  # score-band lattice cumulative gains
    "nbq_confusion",  # per-class confusion rollup
    "lm_doc_bits",  # perplexity bit-bucket lattice
    "lm_bucket_counts",  # same bucket lattice as lm_doc_bits
    "basket_size_profile",  # basket-size lattice cum-share
    # count-of-count / histogram frames (rows = distinct frequencies)
    "skew_report",
    # calendar-bounded arrival-hour bucket frame (~9k rows/year):
    # the audit's prior-high-water cummax runs over one row per
    # bucket, never over events (operators/streamserve.py)
    "delivery_lag_audit",
    # salted two-stage top-N: the ONLY global window runs over the
    # <= SALTS*N stage-1 survivors (sampling.py / retrieval.py)
    "weighted_sample",
    "rrf_fusion",
    # two-level distributed scan: the bucket frame is
    # |docs|/SCAN_BUCKET rows — metadata-sized offsets, with the
    # in-bucket scan partitioned by bucket (packing.py)
    "pack_assign",
    "pack_summary",
}


def _global_windows(plan: str) -> "list[str]":
    """Window nodes whose partition spec is empty. A Window prints as
    `Window [exprs], [partSpec], [orderSpec]`; the partition spec is
    absent when there are fewer than 3 top-level bracket groups AND
    the trailing group is an order spec (contains ASC/DESC) or there
    is only the expression group."""
    out = []
    for line in plan.splitlines():
        if "Window [" not in line:
            continue
        rest = line[line.find("Window ") + len("Window "):]
        depth, groups, cur = 0, [], None
        for ch in rest:
            if ch == "[":
                if depth == 0:
                    cur = []
                    depth += 1
                    continue
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(cur))
                    cur = None
                    continue
            if cur is not None:
                cur.append(ch)
        # The 2-group form is `Window [exprs], [orderSpec]` (empty
        # partition spec) — but only when the second group really IS
        # an order spec. Anchor on the full sort-direction token
        # (`ASC NULLS FIRST` / `DESC NULLS LAST`) rather than a bare
        # ASC|DESC substring, which an identifier inside a partition
        # spec (e.g. an alias `..._ASC_...`) could contain (r10
        # advice).
        if len(groups) == 1 or (
            len(groups) == 2
            and re.search(r"\b(?:ASC|DESC) NULLS (?:FIRST|LAST)\b", groups[1])
        ):
            out.append(line.strip())
    return out


def _plans(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR_ORACLE)
        yield name, df._jdf.queryExecution().sparkPlan().toString()


def test_no_row_at_a_time_python_and_no_cartesian(spark):
    bad_python, bad_cartesian, bad_bnlj, bad_gwin = [], [], [], []
    for name, plan in _plans(spark):
        if "BatchEvalPython" in plan:
            bad_python.append(name)
        if "CartesianProduct" in plan:
            bad_cartesian.append(name)
        if (
            "BroadcastNestedLoopJoin" in plan
            and name not in _BOUNDED_CROSSJOIN_OK
        ):
            bad_bnlj.append(name)
        if (
            name not in _BOUNDED_GLOBAL_WINDOW_OK
            and _global_windows(plan)
        ):
            bad_gwin.append(name)
    assert not bad_python, (
        f"row-at-a-time Python UDF (BatchEvalPython) in: {bad_python}"
    )
    assert not bad_cartesian, f"CartesianProduct in: {bad_cartesian}"
    assert not bad_bnlj, (
        "BroadcastNestedLoopJoin outside the documented bounded-"
        f"broadcast allowance: {bad_bnlj} — either the query grew an "
        "unbounded cross join, or add it to _BOUNDED_CROSSJOIN_OK "
        "with a bounded-side justification"
    )
    assert not bad_gwin, (
        "Window with an EMPTY partition spec outside the documented "
        f"bounded-frame allowance: {bad_gwin} — a global window "
        "funnels its whole input through one task; repartition the "
        "window, use a salted two-stage top-N, or (if the frame is "
        "genuinely bounded) add the query to "
        "_BOUNDED_GLOBAL_WINDOW_OK with the bound spelled out"
    )
