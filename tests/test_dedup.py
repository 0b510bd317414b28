import pytest
from bike_analyzer_spark.operators import dedup
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

@pytest.mark.parametrize("name", sorted(dedup.QUERIES))
def test_dedup_vs_oracle(spark, duck, name):
    df = dedup.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, dedup.ORACLES[name], name=name)

def test_simhash_locality(spark):
    """A one-token edit moves few simhash bits; disjoint text moves many."""
    from bike_analyzer_spark.operators.dedup import simhash_signatures
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(0, base), (1, base.replace("dog", "cat")),
         (2, "completely different words about spark shuffles and parquet")],
        "doc_id long, text string",
    )
    sig = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(sig[0], sig[1]) < ham(sig[0], sig[2])
    assert ham(sig[0], sig[1]) <= 10

def test_ngram_jaccard_hot_shingle_bounded(spark, tmp_path):
    """A planted stop-shingle shared by EVERY doc must not create
    pairs by itself: with the df cap it is dropped before the
    self-join, so docs sharing only the hot shingle never pair, while
    genuinely similar docs still do (Jaccard over the capped space)."""
    import os
    hot = "common boiler plate"  # one 3-gram shared by all docs
    rows = []
    for i in range(12):
        rows.append((i, f"{hot} unique{i}a unique{i}b unique{i}c unique{i}d",
                     "en", "s1", 0))
    # one genuinely similar pair within the same source
    rows.append((100, f"{hot} shared tail of text alpha beta", "en", "s1", 0))
    rows.append((101, f"{hot} shared tail of text alpha gamma", "en", "s1", 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "hotshingle")
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {(r.a, r.b): r.jaccard
           for r in dedup.dedup_ngram_jaccard(spark, d, df_cap=4).collect()}
    # every pair among docs 0..11 shares ONLY the capped hot shingle
    assert all(a >= 100 for (a, b) in got), got
    assert (100, 101) in got and got[(100, 101)] > 0.5
    # and the capped intersection join materializes zero rows for the
    # hot shingle: candidate volume stays bounded under skew
    uncapped = {(r.a, r.b)
                for r in dedup.dedup_ngram_jaccard(
                    spark, d, df_cap=10**9).collect()}
    assert len(uncapped) > len(got)  # the cap really removed fan-out


def test_minhash_finds_planted_near_dup(spark):
    """A doc with one word changed out of 40 must surface as a
    high-jaccard LSH candidate pair."""
    from bike_analyzer_spark.operators.dedup import (
        _doc_shingles, _jaccard_for, lsh_candidates, minhash_signatures,
    )
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon "
             "phi chi psi omega one two three four five six "
             "seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen")
    near = words.replace("pi", "pie")
    docs = spark.createDataFrame(
        [(0, words), (1, near), (2, "unrelated short text here nothing shared")],
        "doc_id long, text string",
    )
    ds = _doc_shingles(docs)
    pairs = _jaccard_for(lsh_candidates(minhash_signatures(docs)), ds, 0.05)
    got = {(r.a, r.b): r.jaccard for r in pairs.collect()}
    assert (0, 1) in got and got[(0, 1)] > 0.8
    assert (0, 2) not in got and (1, 2) not in got


def test_bloom_prune_keeps_all_matches_and_prunes_misses(spark):
    """The store-side Bloom prune (r6 VERDICT ask #6): zero false
    negatives — every store row whose (band, sig) really occurs in the
    shard survives — while rows sharing nothing with the shard are
    (almost all) pruned map-side."""
    shard = spark.createDataFrame(
        [(i, i % 4, f"sig{i % 50}") for i in range(0, 200, 2)],
        "doc_id long, band int, sig string",
    )
    matching = [(1000 + i, i % 4, f"sig{i % 50}") for i in range(0, 200, 2)]
    disjoint = [(2000 + i, i % 4, f"other{i}") for i in range(400)]
    store = spark.createDataFrame(
        matching + disjoint, "doc_id long, band int, sig string"
    )
    kept = dedup._bloom_prune(spark, store, shard, n_keys=shard.count())
    kept_ids = {r.doc_id for r in kept.collect()}
    assert {d for d, _, _ in matching} <= kept_ids  # no false negatives
    fp = len(kept_ids) - len(matching)
    assert fp <= len(disjoint) * 0.05, f"{fp} false positives"


def test_incr_near_bloom_path_matches_and_filters_store_scan(
    spark, monkeypatch
):
    """With the cost-model gate forced open, dedup_incr_near must (a)
    return byte-identical rows to the un-pruned path and (b) carry the
    Bloom bit-test filter on the store side of its plan — the
    element_at probe against the broadcast `bf` word array, evaluated
    during the store scan stage, BEFORE the band join's exchange."""
    base = dedup.dedup_incr_near(spark, SF_DIR_ORACLE)
    plain = [tuple(r) for r in base.collect()]
    assert "_b0" not in base._jdf.queryExecution().executedPlan().toString()

    monkeypatch.setattr(dedup, "BLOOM_MIN_DOCS", 0)
    pruned_df = dedup.dedup_incr_near(spark, SF_DIR_ORACLE)
    pruned = [tuple(r) for r in pruned_df.collect()]
    assert pruned == plain
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    # the probe bit-tests against the broadcast word table, one per
    # Bloom hash, each a map-side BroadcastHashJoin on the store side
    for i in range(dedup.BLOOM_HASHES):
        assert f"_b{i}" in plan
    assert plan.count("BroadcastHashJoin") >= dedup.BLOOM_HASHES


def test_bloom_never_drops_true_keys_property(spark):
    """Hypothesis-grade property, batched into one Spark pass: for
    randomized (band, sig) universes, every store row whose key
    occurs in the shard survives the Bloom prune — the no-false-
    negative guarantee that makes the prune result-invariant."""
    import random

    rng = random.Random(20260814)
    for trial in range(3):
        n_keys = rng.randint(1, 300)
        shard_rows = [
            (i, rng.randint(0, 7), f"s{rng.randint(0, n_keys)}")
            for i in range(n_keys)
        ]
        shard = spark.createDataFrame(
            shard_rows, "doc_id long, band int, sig string"
        )
        shard_keys = {(b, s) for _, b, s in shard_rows}
        store_rows = [
            (1000 + i, rng.randint(0, 7), f"s{rng.randint(0, 2 * n_keys)}")
            for i in range(600)
        ]
        store = spark.createDataFrame(
            store_rows, "doc_id long, band int, sig string"
        )
        kept = {
            r.doc_id
            for r in dedup._bloom_prune(
                spark, store, shard, n_keys=len(shard_rows)
            ).collect()
        }
        must_keep = {
            d for d, b, s in store_rows if (b, s) in shard_keys
        }
        assert must_keep <= kept, (trial, must_keep - kept)
