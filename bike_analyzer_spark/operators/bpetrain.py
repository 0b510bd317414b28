"""Distributed BPE merge-table training — the Spark version of
`scripts/learn_bpe.py` (which learns the `text.BPE_MERGES` constant
serially via DuckDB + a Python loop). Classic Sennrich et al. 2016
greedy byte-pair-encoding, but every round's heavy step runs as a
DataFrame aggregation:

    per round:  pair-count aggregate over the VOCABULARY table
                (weighted by token frequency)
             →  1-row argmax (count desc, then lexicographically
                smallest pair — the serial learner's exact tie-break)
             →  greedy leftmost merge applied to every token's symbol
                array with one `aggregate` fold (no UDF)

Scale shape: the corpus is touched ONCE (token histogram — map-side
partial agg into the vocabulary table); all N_MERGES rounds operate
on the vocabulary, which grows ~Heaps' law (far sublinear in corpus
bytes — the same table `vocab.py` profiles). Per-round driver state
is ONE (pair, count) row — the bounded-argmax pattern the IVF
trainer uses; the symbol table is eagerly checkpointed each round so
lineage stays flat across iterations.

Determinism: no RNG, total tie-break order, integer counts — the
distributed learner reproduces the serial learner byte-for-byte
(tests pin equality against BOTH `scripts/learn_bpe.py` and the
committed `text.BPE_MERGES` constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import tokens
from ..sources.catalog import load

N_MERGES = 16


def _vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(syms: array<string>, c): the weighted vocabulary — the ONE
    corpus-sized pass; every training round after this is
    vocabulary-sized."""
    return (
        load(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .selectExpr("split(t, '') AS syms", "c")
    )


def _best_pair(vocab: DataFrame) -> tuple[str, str] | None:
    """Most frequent adjacent symbol pair (count desc, pair asc) —
    a vocabulary-sized aggregate reduced to ONE driver row."""
    pairs = vocab.selectExpr(
        """filter(
               transform(syms, (x, i) ->
                   IF(i < size(syms) - 1,
                      struct(x AS a, element_at(syms, i + 2) AS b),
                      CAST(NULL AS struct<a: string, b: string>))),
               p -> p IS NOT NULL) AS ps""",
        "c",
    ).select(F.explode("ps").alias("p"), "c")
    top = (
        pairs.groupBy("p.a", "p.b")
        .agg(F.sum("c").alias("n"))
        .orderBy(F.desc("n"), "a", "b")
        .first()
    )
    if top is None:
        return None
    return top.a, top.b


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merged(a: str, b: str) -> str:
    """Greedy leftmost (a,b)->ab merge over the symbol array as one
    `aggregate` fold (the serial learner's in-place loop, re-expressed
    as a pending-symbol accumulator; no UDF, no explode)."""
    la, lb, lab = _sql_str(a), _sql_str(b), _sql_str(a + b)
    return (
        "aggregate(syms,"
        " struct(CAST(array() AS array<string>) AS out,"
        "        CAST(NULL AS string) AS pending),"
        " (acc, s) -> IF(acc.pending IS NULL,"
        "   struct(acc.out AS out, s AS pending),"
        f"  IF(acc.pending = {la} AND s = {lb},"
        f"    struct(concat(acc.out, array({lab})) AS out,"
        "            CAST(NULL AS string) AS pending),"
        "     struct(concat(acc.out, array(acc.pending)) AS out,"
        "            s AS pending))),"
        " acc -> IF(acc.pending IS NULL, acc.out,"
        "           concat(acc.out, array(acc.pending))))"
    )


def learn_bpe(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> list[tuple[str, str]]:
    """The learned merge table, most-frequent-first."""
    vocab = _vocab(spark, sf_dir).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = _best_pair(vocab)
        if best is None:
            break
        merges.append(best)
        vocab = vocab.selectExpr(
            f"{_merged(*best)} AS syms", "c"
        ).localCheckpoint(eager=True)
    return merges
