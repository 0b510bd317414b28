"""jsonlcorpus Python DataSource writer: executor-parallel staged
writes, driver-side manifest commit, overwrite/append semantics, and
round-trip through the existing JSONL reader."""

import json
import os

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.sources import corpusio
from bike_analyzer_spark.sources.corpus_datasource import (
    MANIFEST,
    CorpusSinkDataSource,
    manifest_shards,
)
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(CorpusSinkDataSource)
    return spark


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")


def test_round_trip_through_corpusio_reader(registered, tmp_path):
    spark = registered
    docs = _docs(spark).repartition(4)
    out = str(tmp_path / "corpus")
    docs.write.format("jsonlcorpus").mode("overwrite").save(out)
    back = corpusio.read_jsonl(spark, out)
    want = sorted(map(tuple, docs.collect()))
    got = sorted(map(tuple, back.select(*docs.columns).collect()))
    assert got == want
    # the manifest, not the listing, is the contract — but they must
    # agree right after a commit
    man = manifest_shards(out)
    files = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert {s["file"] for s in man["shards"]} == files
    assert man["n_rows_total"] == docs.count()
    assert len(man["shards"]) == 4  # one shard per partition


def test_staging_is_cleaned_and_invisible(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "corpus")
    _docs(spark).write.format("jsonlcorpus").mode("overwrite").save(out)
    staging = os.path.join(out, "_staging")
    assert not os.path.exists(staging) or not any(os.scandir(staging))
    # underscore-prefixed names are skipped by Spark readers: the
    # manifest itself must not surface as a (corrupt or ghost) row
    assert corpusio.corrupt_lines(spark, out).isEmpty()


def test_overwrite_replaces_published_shards(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "corpus")
    _docs(spark).write.format("jsonlcorpus").mode("overwrite").save(out)
    first = {s["file"] for s in manifest_shards(out)["shards"]}
    small = _docs(spark).filter(F.col("doc_id") < 5).repartition(1)
    small.write.format("jsonlcorpus").mode("overwrite").save(out)
    man = manifest_shards(out)
    assert man["n_rows_total"] == small.count()
    survivors = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert not (first & survivors)  # old shards physically gone
    assert corpusio.read_jsonl(spark, out).count() == small.count()


def test_append_extends_the_manifest(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "corpus")
    docs = _docs(spark)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    a.write.format("jsonlcorpus").mode("overwrite").save(out)
    b.write.format("jsonlcorpus").mode("append").save(out)
    assert manifest_shards(out)["n_rows_total"] == docs.count()
    back = corpusio.read_jsonl(spark, out)
    assert sorted(map(tuple, back.select(*docs.columns).collect())) == \
        sorted(map(tuple, docs.collect()))


def test_missing_path_is_a_loud_error(registered):
    spark = registered
    with pytest.raises(Exception, match="path"):
        _docs(spark).write.format("jsonlcorpus").mode("overwrite").save()


def test_stream_writer_lands_batches_exactly_once(
    registered, tmp_path
):
    """File-source stream (1 file per trigger) through the
    jsonlcorpus STREAM writer: every micro-batch publishes into the
    manifest with its batch id; a checkpoint-resumed drain with no
    new input publishes nothing more."""
    import os as _os
    import time

    spark = registered
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = _docs(spark)
    # two input shards with pinned mtimes (file source orders by mtime)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    a.coalesce(1).write.mode("overwrite").parquet(landing + "/s1")
    b.coalesce(1).write.mode("overwrite").parquet(landing + "/s2")
    now = time.time()
    for i, d in enumerate(("s1", "s2")):
        for f in _os.scandir(landing + "/" + d):
            _os.utime(f.path, (now + i, now + i))

    def drain():
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(landing + "/s*")
            .writeStream.format("jsonlcorpus")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    drain()
    man = manifest_shards(out)
    assert man["n_rows_total"] == docs.count()
    assert len(man["committed_batches"]) >= 1
    back = corpusio.read_jsonl(spark, out)
    assert sorted(map(tuple, back.select(*docs.columns).collect())) == \
        sorted(map(tuple, docs.collect()))
    # resume from the checkpoint with no new files: nothing published
    before = man["n_rows_total"]
    drain()
    assert manifest_shards(out)["n_rows_total"] == before


def test_stream_commit_replay_is_noop(registered, tmp_path):
    """Unit-level idempotence: re-committing an already-recorded
    batch id publishes nothing (the restart-replays-last-epoch
    case)."""
    from bike_analyzer_spark.sources.corpus_datasource import (
        ShardCommit,
        _StreamWriter,
    )

    out = str(tmp_path / "out")
    os.makedirs(out)
    w = _StreamWriter({"path": out})
    stage = os.path.join(out, "_staging", w.write_id)
    os.makedirs(stage)
    x = os.path.join(stage, "x.jsonl")
    with open(x, "w") as f:
        f.write('{"doc_id": 1}\n')
    w.commit([ShardCommit(file="x.jsonl", n_rows=1, staged=x)], batchId=7)
    assert manifest_shards(out)["n_rows_total"] == 1
    # replay batch 7 with a restaged copy
    os.makedirs(stage, exist_ok=True)
    y = os.path.join(stage, "y.jsonl")
    with open(y, "w") as f:
        f.write('{"doc_id": 1}\n')
    w.commit([ShardCommit(file="y.jsonl", n_rows=1, staged=y)], batchId=7)
    man = manifest_shards(out)
    assert man["n_rows_total"] == 1
    assert man["committed_batches"] == [7]
    assert not os.path.exists(os.path.join(out, "y.jsonl"))
