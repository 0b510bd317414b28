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
