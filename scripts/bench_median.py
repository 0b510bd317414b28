"""Merge K bench detail sidecars into one median-of-K artifact.

Round-13 fix for the adoption RATCHET the r12 verdict flagged: the
old workflow ("cp the best clean tmp", where faster-than-reference
never counts against a candidate) makes the committed
BENCH_DETAIL.json a running MINIMUM over every run ever adopted. On
a host whose true speed drifts (r12 measured a uniform ~1.2x
same-code slowdown vs the r11-era artifact), a running minimum
becomes permanently unreproducible and every honest future run looks
contaminated against it.

The committed artifact is therefore now the PER-QUERY MEDIAN of K
independent gate-passing runs (median-of-K): unbiased under
symmetric noise, robust to a single steal window landing on any one
query in any one run, and reproducible — a fresh clean run should
sit near it, not above it.

Re-baseline policy (documented here because this script implements
it): hypervisor-steal noise is ONE-SIDED (it only inflates), so a
candidate's median ratio > 1.15 vs the committed artifact normally
means contamination (scripts/bench_health.py). But when EVERY
steal-free run over a long window sits above 1.15x UNIFORMLY (no
localized spikes, flat alphabet thirds), the host itself has
slowed and the artifact is stale; the correct move is to adopt the
median-of-K of the new runs anyway and disclose the re-baseline in
the round's OPTIMIZATION notes with the per-run summaries. That is
what --rebaseline acknowledges; without it, every input must name a
run that passed bench_health against the current committed artifact.

Usage:
  python scripts/bench_median.py OUT IN1 IN2 [IN3 ...] [--rebaseline]

Each IN is a bench.py detail sidecar (BENCH_DETAIL.tmp.json shape).
All inputs must cover the same query set at the same SFs. OUT gets
the per-query median for the primary and (when present) secondary
maps, with provenance: the input count and each input's per-SF
totals.
"""

from __future__ import annotations

import json
import statistics
import sys


def merge_details(details: "list[dict]") -> dict:
    """Per-query median across K detail dicts (primary + secondary)."""
    if len(details) < 2:
        raise ValueError("median-of-K needs K >= 2 runs")
    base = details[0]
    for d in details[1:]:
        if set(d["queries"]) != set(base["queries"]):
            raise ValueError("inputs cover different query sets")
        if d.get("sf") != base.get("sf"):
            raise ValueError("inputs ran at different primary SFs")
    out = {
        "kind": "bench_detail",
        "sf": base.get("sf"),
        "queries": {
            q: round(statistics.median(d["queries"][q] for d in details), 3)
            for q in base["queries"]
        },
        "merged_from": len(details),
        "merged_totals": [
            round(sum(d["queries"].values()), 3) for d in details
        ],
    }
    secs = [d.get("secondary") for d in details]
    if all(s is not None for s in secs):
        if any(set(s["queries"]) != set(secs[0]["queries"]) for s in secs):
            raise ValueError("inputs cover different secondary query sets")
        merged_sec = {
            q: round(
                statistics.median(s["queries"][q] for s in secs), 3
            )
            for q in secs[0]["queries"]
        }
        out["secondary"] = {
            "sf": secs[0].get("sf"),
            "queries": merged_sec,
            "value": round(sum(merged_sec.values()), 3),
            "reps": secs[0].get("reps", 1),
        }
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    out_path, in_paths = args[0], args[1:]
    details = []
    for p in in_paths:
        with open(p) as f:
            details.append(json.load(f))
    merged = merge_details(details)
    merged["merged_inputs"] = [p.split("/")[-1] for p in in_paths]
    if "--rebaseline" in sys.argv[1:]:
        merged["rebaselined"] = True
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(
        f"wrote {out_path}: median-of-{len(details)} "
        f"(totals {merged['merged_totals']}, "
        f"merged total {round(sum(merged['queries'].values()), 3)})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
