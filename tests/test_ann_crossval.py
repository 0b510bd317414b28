"""ANN cross-validation: ONE planted near-duplicate that every ANN
path must retrieve (r4 judge ask #8).

Each path has its own recall tests, but nothing previously forced all
of them to agree on the same instance. Here a vector that is a 1.001x
scalar multiple of corpus vector 100 (cosine exactly 1.0 — scaling
never changes cosine) is planted with vec_id = -1. Since every top-k
path defines its query set as ``vec_id < N_QUERIES``, the plant is
automatically a query in the UNMODIFIED public operators — no test-
only search API:

  - brute force     : exact scan must rank 100 first (sanity floor)
  - IVF             : the plant must assign to 100's list and probe it
  - PQ ADC + rerank : 100's code must survive the RERANK cut and win
  - LSH near-dup    : the pair (-1, 100) must share a bucket and pass
                      the 0.95 cosine verify

The synthetic corpus is written as a parquet DIRECTORY so the catalog
reads it directly (directory sources are already "many files" to the
spread-cache path).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as papq
import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import ivf, pq, similarity
from tests.conftest import SF_DIR_SMOKE

BASE_ID = 100
PLANT_ID = -1  # < N_QUERIES, so every top-k path treats it as a query


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    src = papq.read_table(os.path.join(SF_DIR_SMOKE, "embeddings.parquet"))
    rows = src.to_pylist()
    base = next(r for r in rows if r["vec_id"] == BASE_ID)
    planted = {
        "vec_id": PLANT_ID,
        "embedding": [x * 1.001 for x in base["embedding"]],
        "label": base["label"],
    }
    out = tmp_path_factory.mktemp("ann_xval")
    d = out / "embeddings.parquet"
    d.mkdir()
    papq.write_table(
        pa.Table.from_pylist(rows + [planted], schema=src.schema),
        str(d / "part-00000.parquet"),
    )
    return str(out)


def _rank1(df):
    r = (
        df.filter(F.col("query_id") == PLANT_ID)
        .orderBy("rank")
        .select("neighbor_id", "cos")
        .first()
    )
    assert r is not None, "planted query missing from result"
    return r.neighbor_id, r.cos


def test_bruteforce_finds_planted(spark, synth_dir):
    nid, cos = _rank1(similarity.sim_topk_bruteforce(spark, synth_dir))
    assert (nid, cos) == (BASE_ID, 1.0)


def test_ivf_finds_planted(spark, synth_dir):
    nid, cos = _rank1(ivf.sim_ivf_topk(spark, synth_dir))
    assert (nid, cos) == (BASE_ID, 1.0)


def test_pq_finds_planted(spark, synth_dir):
    nid, cos = _rank1(pq.sim_pq_topk(spark, synth_dir))
    assert (nid, cos) == (BASE_ID, 1.0)


def test_lsh_near_dup_finds_planted_pair(spark, synth_dir):
    row = (
        similarity.dedup_embed_cosine(spark, synth_dir)
        .filter((F.col("a") == PLANT_ID) & (F.col("b") == BASE_ID))
        .first()
    )
    assert row is not None, "planted pair never shared an LSH bucket"
    assert row.cos == 1.0
