"""Judge a candidate bench run against a reference detail before
adopting it as the committed BENCH_DETAIL.json artifact.

Round-12 lesson: the adopt gate's loadavg_start < 1.0 check cannot
see NEIGHBOR-tenant pressure — this sandbox is a VM on a shared
host, and two r12 runs that started at loadavg 0.1 still carried
2-8x localized per-query inflation (hypervisor steal) that began
minutes into the run. The per-query detail itself is the only
reliable contention detector: a genuinely clean run tracks the
reference per-query within noise, while a contention window shows a
contiguous block of queries at several times their reference.

Usage: python scripts/bench_health.py [candidate] [reference]
       candidate defaults to BENCH_DETAIL.tmp.json,
       reference to `git show HEAD:BENCH_DETAIL.json`.
Exit 0 iff the candidate looks clean:
  - median per-query ratio <= MEDIAN_MAX (1.15), and
  - no SPIKE: ratio > SPIKE_RATIO (2.5) with absolute inflation
    > SPIKE_ABS_S (0.5 s) on any query.
Queries the candidate runs FASTER than reference never count
against it (that is what an optimization round is for).
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

MEDIAN_MAX = 1.15
SPIKE_RATIO = 2.5
SPIKE_ABS_S = 0.5


def _load(path: str) -> dict:
    if path == "HEAD":
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH_DETAIL.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out)
    with open(path) as f:
        return json.load(f)


def main() -> int:
    cand_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.tmp.json"
    ref_path = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    cand = _load(cand_path)["queries"]
    ref = _load(ref_path)["queries"]
    common = sorted(set(cand) & set(ref))
    if not common:
        print("bench_health: no common queries", file=sys.stderr)
        return 2
    ratios = {k: cand[k] / ref[k] for k in common}
    med = statistics.median(ratios.values())
    spikes = [
        (k, ratios[k], ref[k], cand[k])
        for k in common
        if ratios[k] > SPIKE_RATIO and cand[k] - ref[k] > SPIKE_ABS_S
    ]
    first = statistics.median(ratios[k] for k in common[: len(common) // 3])
    last = statistics.median(ratios[k] for k in common[-len(common) // 3 :])
    print(
        f"candidate={cand_path} reference={ref_path} n={len(common)}\n"
        f"median ratio {med:.3f}  (alphabet thirds: first {first:.3f} / "
        f"last {last:.3f})\n"
        f"totals: cand {sum(cand[k] for k in common):.1f} s vs "
        f"ref {sum(ref[k] for k in common):.1f} s"
    )
    for k, r, rv, cv in sorted(spikes, key=lambda t: -t[1])[:15]:
        print(f"SPIKE {k}: {rv:.2f} -> {cv:.2f} s (x{r:.1f})")
    ok = med <= MEDIAN_MAX and not spikes
    print("verdict:", "CLEAN" if ok else "CONTAMINATED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
