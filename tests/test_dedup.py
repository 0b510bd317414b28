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
