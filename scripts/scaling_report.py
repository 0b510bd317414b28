"""Derive SCALING.md from BENCH_DETAIL.json: per-query wall-time
ratio across the 10x data step (secondary sf -> primary sf), grouped
into the engine's query families. A ratio near 1 means fixed
overhead (planning + JVM job launch) dominates at these SFs; the
interesting rows are the ones well above 1 — those are the queries
actually data-bound at sf0.1, and their ratio vs 10 shows how
sublinearly the plan scales.

Usage: python scripts/scaling_report.py [BENCH_DETAIL.json] > SCALING.md
"""

from __future__ import annotations

import json
import sys

FAMILIES = [
    ("KPI / readers / windows", ("q1", "q2", "q3", "q4", "p1", "p2", "a2",
                                 "a7", "a8", "a9", "a11", "a12", "w1", "w3",
                                 "w4", "s14", "f_")),
    ("OD / graph", ("od_", "geo_")),
    ("events analytics", ("event_transitions", "activity_", "cusum",
                          "psi_", "robust_outliers", "attribution",
                          "stats_", "cohort", "rolling_user",
                          "funnel", "scd2", "event_gap",
                          "purchase_value_rank", "dormant", "ltv_",
                          "above_avg", "scale_", "ab_test",
                          "event_cooccurrence", "dau_wau",
                          "ordered_funnel", "path_", "holt",
                          "hll_", "kmins_", "benford", "rfm", "seasonal",
                          "retention_", "theilsen", "type_affinity",
                          "weekly_", "metric_", "web_order", "winsorized",
                          "markov_", "ab_cuped")),
    ("retrieval", ("bm25", "rrf_", "entity_")),
    ("analytics ext", ("monthly_", "set_ops", "rollup", "ntile", "pivot",
                       "value_percentiles", "value_reversals", "cube",
                       "purchase_quartiles", "purchase_value_distribution",
                       "user_value_navigation", "event_grouping_sets",
                       "nation_metrics_unpivot", "skyline")),
    ("ANN / embeddings", ("sim_", "semdedup", "ann_recall",
                          "ivf_label", "quantile_error")),
    ("dedup family", ("dedup_", "span_", "minhash_error")),
    ("text / quality / LM", ("text_", "tfidf", "decontam", "lang",
                             "vocab_", "lm_", "nbq_", "dsir_", "fingerprint",
                             "domain_")),
    ("pipeline ops", ("split_", "stratified", "weighted_sample", "mix_",
                      "pack_", "scrub_", "curate", "cms_", "approx",
                      "fuzzy_", "source_data", "mm_", "corpus_build",
                      "ngram_novelty", "bloom_", "source_overlap")),
    ("table services", ("hypertable", "busy_islands", "range_join",
                        "session", "asof", "profile", "zorder", "tpch_",
                        "integrity", "skew_report", "time_weighted",
                        "fulfillment", "basket", "revenue_pareto",
                        "event_disorder")),
]


def family_of(name: str) -> str:
    for fam, prefixes in FAMILIES:
        if any(name.startswith(p) for p in prefixes):
            return fam
    return "other"


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
    d = json.load(open(path))
    prim, sec = d["queries"], d["secondary"]["queries"]
    sf_hi, sf_lo = d["sf"], d["secondary"]["sf"]
    step = sf_hi / sf_lo
    rows = [
        (name, sec[name], prim[name], prim[name] / sec[name])
        for name in prim
        if name in sec and sec[name] > 0
    ]
    fams: dict[str, list] = {}
    for name, lo, hi, r in rows:
        fams.setdefault(family_of(name), []).append((name, lo, hi, r))

    print(f"# SCALING — wall-time across the {step:.0f}x data step "
          f"(sf{sf_lo} → sf{sf_hi})\n")
    print("Derived from BENCH_DETAIL.json by scripts/scaling_report.py.")
    tot_lo = sum(lo for _, lo, _, _ in rows)
    tot_hi = sum(hi for _, _, hi, _ in rows)
    if tot_lo > tot_hi:
        print(
            f"\n**Contention caveat:** this detail's sf{sf_lo} pass "
            f"({tot_lo:.0f} s) exceeds its sf{sf_hi} pass "
            f"({tot_hi:.0f} s) — physically impossible on equal "
            "footing, so the smaller-SF pass (which runs LAST) was "
            "inflated by host contention mid-run. Ratios below are "
            "therefore a LOWER bound on the true data-scaling slope; "
            "treat sub-1.0 rows as floor noise, not speedups.")
    print(f"A ratio near 1.0 = fixed overhead dominates; {step:.0f}.0 = "
          "perfectly linear in data; the gap below "
          f"{step:.0f} is the engine's sublinearity (partial aggs, "
          "bounded candidates, vocabulary-sized state).\n")
    print("| family | queries | median ratio | max ratio (query) |")
    print("|---|---|---|---|")
    for fam, members in sorted(fams.items()):
        ratios = sorted(r for _, _, _, r in members)
        med = ratios[len(ratios) // 2]
        mx = max(members, key=lambda m: m[3])
        print(f"| {fam} | {len(members)} | {med:.2f} | "
              f"{mx[3]:.2f} ({mx[0]}) |")
    print("\n## Slowest ten at sf%s\n" % sf_hi)
    print("| query | sf%s s | sf%s s | ratio |" % (sf_lo, sf_hi))
    print("|---|---|---|---|")
    for name, lo, hi, r in sorted(rows, key=lambda m: -m[2])[:10]:
        print(f"| {name} | {lo:.2f} | {hi:.2f} | {r:.2f} |")


if __name__ == "__main__":
    main()
