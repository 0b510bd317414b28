import pytest
from bike_analyzer_spark.operators import similarity
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

@pytest.mark.parametrize("name", sorted(similarity.QUERIES))
def test_similarity_vs_oracle(spark, duck, name):
    df = similarity.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, similarity.ORACLES[name], name=name)

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
