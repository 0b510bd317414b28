"""Set-similarity join tests: prefix filtering + sorted neighborhood.

Three layers, following the dedup test model (SURVEY.md §5):
oracle parity at sf0.01, a brute-force python replay of each
algorithm on synthetic documents with hand-placed near-dups, and a
pruning-effectiveness bound (the prefix join must generate strictly
fewer candidate pairs than the naive any-shared-shingle join, or the
blocking is decorative).
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import setjoin
from bike_analyzer_spark.operators.setjoin import (
    SNM_KEY_LEN,
    SNM_WINDOW,
    TAU_DEN,
    TAU_NUM,
    _doc_shingle_sets,
    prefix_filter_pairs,
    sorted_neighborhood_pairs,
)
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(setjoin.QUERIES))
def test_setjoin_vs_oracle(spark, duck, name):
    df = setjoin.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, setjoin.ORACLES[name], name=name)


def _shingles(text: str) -> frozenset[str]:
    toks = text.split()
    return frozenset(
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    )


def _jaccard_ok(x: frozenset, y: frozenset) -> bool:
    inter = len(x & y)
    return (TAU_DEN + TAU_NUM) * inter >= TAU_NUM * (len(x) + len(y))


_SYNTH = [
    # two near-dup clusters sharing long runs, plus unrelated docs
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3, "one two three four five six seven eight nine ten eleven"),
    (4, "one two three four five six seven eight nine ten twelve"),
    (5, "totally unrelated words about shuffles partitions and joins"),
    (6, "another document with its own distinct vocabulary entirely here"),
    # short doc (< 3 tokens -> empty shingle set, must never pair)
    (7, "tiny doc"),
]


def _synth_df(spark):
    return spark.createDataFrame(_SYNTH, "doc_id long, text string")


def test_prefix_filter_equals_bruteforce(spark):
    """Losslessness on synthetic docs: the prefix-pruned join finds
    exactly the brute-force Jaccard >= tau pair set."""
    got = {
        (r.a, r.b)
        for r in prefix_filter_pairs(_synth_df(spark)).collect()
    }
    sets = {d: _shingles(t) for d, t in _SYNTH}
    want = {
        (a, b)
        for a, b in combinations(sorted(sets), 2)
        if sets[a] and sets[b] and _jaccard_ok(sets[a], sets[b])
    }
    assert want, "synthetic fixture must contain at least one true pair"
    assert got == want


def test_prefix_filter_scores_exact(spark):
    """inter/na/nb/jacc_bp are the exact integers of the true sets."""
    sets = {d: _shingles(t) for d, t in _SYNTH}
    for r in prefix_filter_pairs(_synth_df(spark)).collect():
        x, y = sets[r.a], sets[r.b]
        inter = len(x & y)
        assert (r.inter, r.na, r.nb) == (inter, len(x), len(y))
        assert r.jacc_bp == (10000 * inter) // (len(x) + len(y) - inter)


def test_prefix_join_prunes(spark):
    """The prefix join's candidate volume must be strictly below the
    naive any-shared-shingle pair count at sf0.01 — otherwise the
    prefix is not filtering anything."""
    from bike_analyzer_spark.sources.catalog import load

    docs = load(spark, SF_DIR_ORACLE, "documents")
    ds = _doc_shingle_sets(docs)
    naive = (
        ds.select(F.col("doc_id").alias("a"), "sh")
        .join(ds.select(F.col("doc_id").alias("b"), "sh"), "sh")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .count()
    )
    prefix_only = setjoin._prefix_candidates(
        ds, TAU_NUM, TAU_DEN, positional=False
    ).count()
    positional = setjoin._prefix_candidates(ds, TAU_NUM, TAU_DEN).count()
    assert prefix_only < naive / 5, (prefix_only, naive)
    # the positional filter never ADDS candidates (at sf0.01 every
    # prefix candidate is a true pair, so the counts may tie; the
    # strict-pruning case is pinned synthetically below)
    assert positional <= prefix_only, (positional, prefix_only)


def test_positional_filter_prunes_deep_match(spark):
    """PPJoin positional filter, exact pruning case: docs A and B
    share exactly ONE shingle, sitting at rank 3 — the LAST slot — of
    both prefixes (n=10, tau=4/5 → prefix 3, minoverlap 9). The match
    bound 1 + min(10-3, 10-3) = 8 < 9, so the positional filter drops
    the pair that prefix filtering alone admits; A∩B = 1 of 19, so
    dropping it costs zero recall."""
    rows = []
    # A(1): two unique shingles (df=1, sort first), the shared "ma"
    # shingle (df=2), then seven df=2 fillers named after it
    rows += [(1, "aa u1"), (1, "ab u2"), (1, "ma shared")]
    rows += [(1, f"za f{i}") for i in range(7)]
    # B(2): same shape, fillers shared with C instead
    rows += [(2, "ba v1"), (2, "bb v2"), (2, "ma shared")]
    rows += [(2, f"zb g{i}") for i in range(7)]
    # C(3): carries both filler families so they get df=2
    rows += [(3, f"za f{i}") for i in range(7)]
    rows += [(3, f"zb g{i}") for i in range(7)]
    ds = spark.createDataFrame(rows, "doc_id long, sh string")
    loose = {
        (r.a, r.b)
        for r in setjoin._prefix_candidates(
            ds, TAU_NUM, TAU_DEN, positional=False
        ).collect()
    }
    tight = {
        (r.a, r.b)
        for r in setjoin._prefix_candidates(ds, TAU_NUM, TAU_DEN).collect()
    }
    assert loose == {(1, 2)}
    assert tight == set()


def test_sorted_neighborhood_equals_replay(spark):
    """Python replay of the SNM semantics (block by first token, sort
    by 24-char key then doc_id, window w, exact Jaccard) must equal
    the Spark result on the synthetic fixture."""
    got = {
        (r.a, r.b): r.inter
        for r in sorted_neighborhood_pairs(_synth_df(spark)).collect()
    }
    blocks: dict[str, list[tuple[str, int]]] = {}
    for d, t in _SYNTH:
        blocks.setdefault(t.split()[0], []).append(
            (t.strip()[:SNM_KEY_LEN], d)
        )
    sets = {d: _shingles(t) for d, t in _SYNTH}
    want = {}
    for members in blocks.values():
        members.sort()
        for i, (_, a) in enumerate(members):
            for _, b in members[i + 1 : i + SNM_WINDOW]:
                if _jaccard_ok(sets[a], sets[b]):
                    want[(a, b)] = len(sets[a] & sets[b])
    assert got == want


def test_snm_finds_planted_neighbors_only_within_window(spark):
    """A true near-dup pair separated beyond the window by
    intervening sort keys must NOT pair (the SNM recall trade),
    while adjacent near-dups must."""
    # doc 0 and doc 100: 30 tokens, differing only in token 3 (inside
    # the 24-char sort key) -> 25 of 28 shingles shared, J = 25/31 =
    # 0.806 >= tau, but their sort keys bracket the fillers'
    common = " ".join(f"c{j}" for j in range(27))
    rows = [(0, f"zz top aa {common}")]
    # w-1 distinct docs whose keys sort BETWEEN 'zz top aa…' and
    # 'zz top zz…' (same block token 'zz'), pushing the true pair
    # SNM_WINDOW positions apart
    for i in range(1, SNM_WINDOW):
        filler = " ".join(f"filler{i}w{j}" for j in range(8))
        rows.append((i, f"zz top m{i} {filler}"))
    rows.append((100, f"zz top zz {common}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.a, r.b) for r in sorted_neighborhood_pairs(docs).collect()
    }
    # doc 0 and doc 100 share J >= tau but sit SNM_WINDOW apart
    sets = {d: _shingles(t) for d, t in rows}
    assert _jaccard_ok(sets[0], sets[100])
    assert (0, 100) not in pairs
    # move the dup adjacent (same key prefix) -> it must pair
    rows2 = [rows[0], rows[-1]]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    pairs2 = {
        (r.a, r.b) for r in sorted_neighborhood_pairs(docs2).collect()
    }
    assert (0, 100) in pairs2


def test_sparse_cosine_python_replay(spark):
    """Full python recompute of the quantized TF-IDF cosine on the
    synthetic fixture: same milli-nat idf grid, same integer dot /
    norm / 128-bit ppm division."""
    import math

    from bike_analyzer_spark.operators.setjoin import (
        IDF_QUANT,
        sparse_cosine_topk,
    )

    docs = _synth_df(spark)
    n_docs = len(_SYNTH)
    tf: dict[int, dict[str, int]] = {}
    for d, t in _SYNTH:
        toks = t.split()
        m: dict[str, int] = {}
        for i in range(len(toks) - 2):
            s = " ".join(toks[i : i + 3])
            m[s] = m.get(s, 0) + 1
        tf[d] = m
    df_cnt: dict[str, int] = {}
    for m in tf.values():
        for s in m:
            df_cnt[s] = df_cnt.get(s, 0) + 1
    w = {
        d: {
            s: c * round(math.log(n_docs / df_cnt[s]) * IDF_QUANT)
            for s, c in m.items()
            if round(math.log(n_docs / df_cnt[s]) * IDF_QUANT) > 0
        }
        for d, m in tf.items()
    }
    n2 = {d: sum(v * v for v in m.values()) for d, m in w.items()}
    want = {}
    for a, b in combinations(sorted(w), 2):
        dot = sum(w[a][s] * w[b][s] for s in w[a].keys() & w[b].keys())
        if dot > 0:
            want[(a, b)] = (dot * dot * 1_000_000) // (n2[a] * n2[b])
    got = {
        (r.a, r.b): r.cos2_ppm
        for r in sparse_cosine_topk(docs, k=100).collect()
    }
    assert got == want
    # identical documents must score exactly 1.0 (ppm == 1_000_000)
    assert got[(0, 2)] == 1_000_000


def test_sparse_cosine_hot_shingle_bounded(spark):
    """A planted hot shingle (df high but < n_docs, so idf > 0 and it
    would NOT drop out on its own) must not create pairs by itself:
    with the df cap it is dropped from weights and norms before the
    inverted-index self-join, so docs sharing only the hot shingle
    never pair, while a genuinely similar pair still scores."""
    hot = "common boiler plate"
    rows = []
    for i in range(12):
        rows.append(
            (i, f"{hot} unique{i}a unique{i}b unique{i}c unique{i}d")
        )
    # two docs NOT carrying the hot shingle keep df < n_docs
    rows.append((100, "shared tail of text alpha beta end marker one"))
    rows.append((101, "shared tail of text alpha beta end marker two"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.a, r.b): r.cos2_ppm
        for r in setjoin.sparse_cosine_topk(docs, k=1000, df_cap=4).collect()
    }
    # every pair among docs 0..11 shares ONLY the capped hot shingle
    assert all(a >= 100 for (a, b) in got), got
    assert (100, 101) in got and got[(100, 101)] > 500_000
    # uncapped, the hot shingle fans out: the cap really removed work
    uncapped = {
        (r.a, r.b)
        for r in setjoin.sparse_cosine_topk(
            docs, k=1000, df_cap=10**9
        ).collect()
    }
    assert len(uncapped) > len(got)


def test_idf_grid_spark_duckdb_agree(spark, duck):
    """Pin the milli-nat idf grid against the 1-ulp libm risk (r9
    ADVICE): for every (df, n_docs) pair present at sf0.01 AND sf0.1,
    round(ln(n_docs/df)*1000) computed by the JVM and by DuckDB must
    agree — a half-milli-nat boundary disagreement would flip a
    weight and break the driver's hash equality."""
    import duckdb as _duck
    import glob
    import os

    for sf_dir in (SF_DIR_ORACLE, SF_DIR_ORACLE.replace("sf0.01", "sf0.1")):
        if not glob.glob(os.path.join(sf_dir, "documents.parquet*")):
            continue
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        from bike_analyzer_spark.functions.textfns import shingle_exprs, tokens

        tf = (
            docs.withColumn("toks", tokens("text"))
            .select(
                "doc_id", F.explode(shingle_exprs("toks", 3)).alias("sh")
            )
            .groupBy("doc_id", "sh")
            .count()
        )
        n_docs = docs.count()
        dfs = [
            r.df
            for r in tf.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .select("df")
            .distinct()
            .collect()
        ]
        spark_grid = {
            r.df: r.q
            for r in spark.createDataFrame(
                [(d,) for d in dfs], "df long"
            ).selectExpr(
                "df",
                f"CAST(round(ln({n_docs} / df) * "
                f"{setjoin.IDF_QUANT}) AS BIGINT) AS q",
            ).collect()
        }
        con = _duck.connect()
        duck_grid = dict(
            con.execute(
                "SELECT df, CAST(round(ln(? / df) * ?) AS BIGINT) "
                "FROM (SELECT unnest(?) AS df)",
                [n_docs, setjoin.IDF_QUANT, dfs],
            ).fetchall()
        )
        assert spark_grid == duck_grid, (sf_dir, n_docs)


def test_containment_equals_bruteforce_and_is_asymmetric(spark):
    """Brute-force containment on a fixture with a strict subset doc:
    the quote must be contained in the host (high cont_bp) while the
    host is NOT contained in the quote, and the full ordered-pair
    set must match the naive recompute."""
    from bike_analyzer_spark.operators.setjoin import containment_pairs

    host = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lambda mu nu xi omicron pi rho sigma tau upsilon"
    quote = "alpha beta gamma delta epsilon zeta eta"  # strict prefix
    rows = [
        (0, host),
        (1, quote),
        (2, "unrelated words in another doc entirely about something else"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.a, r.b): (r.inter, r.na, r.nb, r.cont_bp)
        for r in containment_pairs(docs).collect()
    }
    sets = {d: _shingles(t) for d, t in rows}
    want = {}
    for a in sets:
        for b in sets:
            if a == b or not sets[a]:
                continue
            inter = len(sets[a] & sets[b])
            if TAU_DEN * inter >= TAU_NUM * len(sets[a]):
                want[(a, b)] = (
                    inter,
                    len(sets[a]),
                    len(sets[b]),
                    (10000 * inter) // len(sets[a]),
                )
    assert got == want
    assert (1, 0) in got and got[(1, 0)][3] == 10000  # full containment
    assert (0, 1) not in got  # asymmetry: host not contained in quote


def test_cosine_threshold_equals_bruteforce_replay(spark):
    """Losslessness of the AllPairs index prefix on the synthetic
    fixture: the pruned tau-join returns EXACTLY the brute-force
    cosine >= tau pair set, with the same integer cos^2 ppm scores
    as a full python recompute (same milli-nat idf grid, integer
    dot/norm, 128-bit division, cross-multiplied threshold)."""
    import math

    from bike_analyzer_spark.operators.setjoin import (
        COS_TAU_DEN,
        COS_TAU_NUM,
        IDF_QUANT,
        cosine_threshold_pairs,
    )

    docs = _synth_df(spark)
    n_docs = len(_SYNTH)
    tf: dict[int, dict[str, int]] = {}
    for d, t in _SYNTH:
        toks = t.split()
        m: dict[str, int] = {}
        for i in range(len(toks) - 2):
            s = " ".join(toks[i : i + 3])
            m[s] = m.get(s, 0) + 1
        tf[d] = m
    df_cnt: dict[str, int] = {}
    for m in tf.values():
        for s in m:
            df_cnt[s] = df_cnt.get(s, 0) + 1
    w = {
        d: {
            s: c * round(math.log(n_docs / df_cnt[s]) * IDF_QUANT)
            for s, c in m.items()
            if round(math.log(n_docs / df_cnt[s]) * IDF_QUANT) > 0
        }
        for d, m in tf.items()
    }
    n2 = {d: sum(v * v for v in m.values()) for d, m in w.items()}
    num2 = COS_TAU_NUM * COS_TAU_NUM
    den2 = COS_TAU_DEN * COS_TAU_DEN
    want = {}
    for a, b in combinations(sorted(w), 2):
        if not w[a] or not w[b]:
            continue
        dot = sum(w[a][s] * w[b][s] for s in w[a].keys() & w[b].keys())
        if dot * dot * den2 >= num2 * n2[a] * n2[b]:
            want[(a, b)] = (dot * dot * 1_000_000) // (n2[a] * n2[b])
    got = {
        (r.a, r.b): r.cos2_ppm
        for r in cosine_threshold_pairs(docs).collect()
    }
    assert got == want
    # the fixture's planted exact pair must be present at exactly 1.0
    assert got[(0, 2)] == 1_000_000


def test_cosine_threshold_index_prunes(spark):
    """The AllPairs index must be strictly smaller than the full
    weight frame on the sf0.001 corpus (otherwise the prefix is
    decorative), while the result equals the naive tau-join computed
    from the top-k variant's unpruned scores."""
    from bike_analyzer_spark.operators.setjoin import (
        COS_TAU_DEN,
        COS_TAU_NUM,
        cosine_threshold_pairs,
        sparse_cosine_topk,
    )
    from bike_analyzer_spark.sources.catalog import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    thresh = 1_000_000 * COS_TAU_NUM * COS_TAU_NUM // (
        COS_TAU_DEN * COS_TAU_DEN
    )
    # k bounds TakeOrdered's PER-PARTITION priority queue, so it must
    # be corpus-sane: k=10**9 allocates a billion-slot queue per task
    # and kills the JVM (found the hard way). sf0.001 has ~1.3k
    # scoring pairs; 100k covers every pair with margin.
    naive = {
        (r.a, r.b): r.cos2_ppm
        for r in sparse_cosine_topk(docs, k=100_000).collect()
        # integer-exact boundary: replicate the cross-multiplied
        # predicate, not the divided display value
        if r.cos2_ppm >= thresh
    }
    got = {
        (r.a, r.b): r.cos2_ppm
        for r in cosine_threshold_pairs(docs).collect()
    }
    assert got == naive and got, got
