import pytest
from bike_analyzer_spark.operators import similarity
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

@pytest.mark.parametrize("name", sorted(similarity.QUERIES))
def test_similarity_vs_oracle(spark, duck, name):
    df = similarity.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, similarity.ORACLES[name], name=name)

def test_plane_signs_match_lattice(spark):
    """The driver-side PLANE_SIGNS literals are the same +/-1 lattice
    the in-Spark md5 derivation (and the DuckDB oracle) produce."""
    rows = similarity.lsh_plane_signs(spark).collect()
    for r in rows:
        assert similarity.PLANE_SIGNS[r.t][r.h][r.d] == r.sign
    assert len(rows) == similarity.LSH_TABLES * similarity.LSH_PLANES * 64


def test_lsh_bucket_projection_is_shuffle_free(spark):
    """The bucket computation must be a narrow per-row fold: zero
    Exchange nodes anywhere in its plan (the round-2 form paid two
    groupBy shuffles + a plane join per vector)."""
    from bike_analyzer_spark.operators.similarity import _lsh_buckets
    import bike_analyzer_spark.sources.catalog as cat
    emb = cat.load(spark, SF_DIR_ORACLE, "embeddings")
    plan = _lsh_buckets(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_bucket_vec_matches_fold(spark):
    """The Arrow/BLAS bucket kernel and the pure-column zip_with fold
    are the same function — every (vec, table) bucket id identical."""
    from pyspark.sql import functions as F
    import bike_analyzer_spark.sources.catalog as cat
    emb = cat.load(spark, SF_DIR_ORACLE, "embeddings")
    fold = emb.select(
        "vec_id",
        *[similarity._bucket_bits(t).alias(f"b{t}")
          for t in range(similarity.LSH_TABLES)],
    )
    vec = emb.select("vec_id", similarity._bucket_vec("embedding").alias("bs"))
    joined = fold.join(vec, "vec_id")
    bad = joined.filter(
        ~F.expr(" AND ".join(
            f"b{t} = bs[{t}]" for t in range(similarity.LSH_TABLES)))
    ).count()
    assert bad == 0


def test_lsh_groups_identical_vectors(spark):
    """Identical vectors share every bucket; negated vectors share none."""
    from bike_analyzer_spark.operators.similarity import sim_lsh_buckets
    import bike_analyzer_spark.sources.catalog as cat
    from pyspark.sql import functions as F
    emb = cat.load(spark, SF_DIR_ORACLE, "embeddings").limit(1)
    trio = (
        emb.select(F.lit(0).cast("long").alias("vec_id"), "embedding", "label")
        .union(emb.select(F.lit(1).cast("long"), "embedding", "label"))
        .union(emb.select(
            F.lit(2).cast("long"),
            F.transform("embedding", lambda x: -x).alias("embedding"), "label"))
    )
    import tempfile, os
    d = tempfile.mkdtemp(dir="/root/repo/.pytest_cache")
    trio.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    b = {(r.vec_id, r.table_id): r.bucket
         for r in sim_lsh_buckets(spark, d).collect()}
    same = sum(b[(0, t)] == b[(1, t)] for t in range(4))
    opp = sum(b[(0, t)] == b[(2, t)] for t in range(4))
    assert same == 4 and opp == 0


def test_sim_mutual_nn_vs_oracle(spark, duck):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(
        similarity.sim_mutual_nn(spark, SF_DIR_ORACLE),
        duck,
        similarity.ORACLES["sim_mutual_nn"],
        "sim_mutual_nn",
    )


def test_mutual_nn_is_reciprocal_and_matching(spark):
    """Mutual-NN laws: the output is a MATCHING (each vector appears
    in at most one pair) and every pair is reciprocal — b is a's
    rank-1 candidate neighbor and vice versa."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pairs = similarity._scored_lsh_pairs(spark, SF_DIR_ORACLE).cache()
    out = similarity.sim_mutual_nn(spark, SF_DIR_ORACLE).collect()
    seen = set()
    for r in out:
        assert r.a not in seen and r.b not in seen, "not a matching"
        seen.add(r.a)
        seen.add(r.b)
    directed = (
        pairs.select(F.col("a").alias("v"), F.col("b").alias("n"), "cos")
        .unionByName(
            pairs.select(F.col("b").alias("v"), F.col("a").alias("n"), "cos")
        )
        .filter(F.col("cos").isNotNull())
    )
    w = Window.partitionBy("v").orderBy(F.desc("cos"), F.asc("n"))
    nn = {
        r.v: r.n
        for r in directed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .collect()
    }
    for r in out:
        assert nn[r.a] == r.b and nn[r.b] == r.a
    pairs.unpersist()
