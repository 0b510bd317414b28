"""Learn the BPE merge table embedded in operators/text.py.

Deterministic greedy byte-pair-merge learning over the documents
corpus (default /root/testdata/sf0.01 — the correctness-gate SF):

1. collect whitespace tokens with occurrence counts;
2. represent each distinct token as a symbol sequence (initially
   characters);
3. N_MERGES times: count adjacent symbol pairs weighted by token
   frequency, pick the most frequent pair (ties -> lexicographically
   smallest (a, b)), merge it greedily left-to-right in every token.

No RNG anywhere, so the output is reproducible byte-for-byte; rerun
this script and diff against text.BPE_MERGES to audit the constant.

Usage: python scripts/learn_bpe.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import sys
from collections import Counter

import duckdb


def learn(sf_dir: str, n_merges: int) -> list[tuple[str, str]]:
    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT t, count(*) AS c FROM (
            SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
            FROM '{sf_dir}/documents.parquet'
        ) GROUP BY t ORDER BY t
        """
    ).fetchall()
    words: list[tuple[list[str], int]] = [(list(t), c) for t, c in rows]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]  # greedy leftmost
                else:
                    i += 1
    return merges


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out = learn(sf_dir, n)
    print("BPE_MERGES = (")
    for a, b in out:
        print(f"    ({a!r}, {b!r}),")
    print(")")
