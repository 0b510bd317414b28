"""Streaming quality-gated corpus ingest: batch/stream parity (the
stream gate must keep EXACTLY the docs the batch gate keeps),
exactly-once shard processing across restarts, and incremental
append of new shards only."""

import os

import pyarrow as pa
import pyarrow.parquet as papq
import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators.quality import text_quality_rules
from bike_analyzer_spark.streaming import corpus
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture()
def landing(tmp_path):
    """sf0.001 documents split into 4 landed shards."""
    t = papq.read_table(os.path.join(SF_DIR_SMOKE, "documents.parquet"))
    d = tmp_path / "landing"
    d.mkdir()
    n = t.num_rows
    step = (n + 3) // 4
    for i in range(4):
        papq.write_table(
            t.slice(i * step, step), str(d / f"shard-{i:03d}.parquet")
        )
    return tmp_path


def _run(spark, landing):
    gated = corpus.quality_gated(
        corpus.document_stream(spark, str(landing / "landing"))
    )
    corpus.run_gate_to_parquet(
        gated, str(landing / "curated"), str(landing / "ckpt")
    )
    return spark.read.parquet(str(landing / "curated"))


def test_stream_gate_equals_batch_gate(spark, landing):
    batch_keep = {
        r.doc_id
        for r in text_quality_rules(spark, SF_DIR_SMOKE)
        .filter("keep")
        .collect()
    }
    got = {r.doc_id for r in _run(spark, landing).collect()}
    assert got == batch_keep and len(got) > 0


def test_restart_is_exactly_once_and_incremental(spark, landing):
    first = _run(spark, landing).count()

    # restart with NO new shards: the checkpoint must make this a no-op
    again = _run(spark, landing).count()
    assert again == first

    # land one more shard with fresh doc_ids (same texts -> same gate
    # outcomes, offset ids so appends are identifiable)
    t = papq.read_table(os.path.join(SF_DIR_SMOKE, "documents.parquet"))
    shard = t.slice(0, 50)
    shard = shard.set_column(
        shard.schema.get_field_index("doc_id"),
        "doc_id",
        pa.array([v.as_py() + 1_000_000 for v in shard["doc_id"]]),
    )
    papq.write_table(
        shard, str(landing / "landing" / "shard-extra.parquet")
    )
    batch_keep_first50 = {
        r.doc_id
        for r in text_quality_rules(spark, SF_DIR_SMOKE)
        .filter("keep")
        .filter(F.col("doc_id") < 50)
        .collect()
    }
    out = _run(spark, landing)
    new_rows = {
        r.doc_id for r in out.filter(F.col("doc_id") >= 1_000_000).collect()
    }
    assert new_rows == {d + 1_000_000 for d in batch_keep_first50}
    assert out.count() == first + len(new_rows)


def test_scrub_then_gate_parity_and_pii_free_passthrough(spark, landing):
    """On the PII-free fixtures scrub is the identity, so the composed
    scrub->gate stream must keep exactly the quality keep-set; on a
    planted-PII shard the scrubbed text (not the raw text) must be
    what the gate scores and the sink stores."""
    gated = corpus.scrubbed_and_gated(
        corpus.document_stream(spark, str(landing / "landing"))
    )
    corpus.run_gate_to_parquet(
        gated, str(landing / "curated2"), str(landing / "ckpt2")
    )
    out = spark.read.parquet(str(landing / "curated2"))
    batch_keep = {
        r.doc_id
        for r in text_quality_rules(spark, SF_DIR_SMOKE)
        .filter("keep")
        .collect()
    }
    assert {r.doc_id for r in out.collect()} == batch_keep
    assert out.filter(F.col("text").contains("<EMAIL>")).count() == 0

    # plant a shard where one kept-shaped doc carries an email: the
    # stored text must contain the placeholder, never the address
    kept_doc = out.orderBy("doc_id").first()
    import pyarrow as pa, pyarrow.parquet as papq
    planted = pa.table(
        {
            "doc_id": pa.array([2_000_000], type=pa.int64()),
            "text": pa.array([kept_doc.text + " reach me at bob@example.com"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["planted"]),
            "n_chars": pa.array([len(kept_doc.text) + 30], type=pa.int64()),
        }
    )
    papq.write_table(planted, str(landing / "landing" / "shard-pii.parquet"))
    corpus.run_gate_to_parquet(
        corpus.scrubbed_and_gated(
            corpus.document_stream(spark, str(landing / "landing"))
        ),
        str(landing / "curated2"),
        str(landing / "ckpt2"),
    )
    stored = (
        spark.read.parquet(str(landing / "curated2"))
        .filter(F.col("doc_id") == 2_000_000)
        .collect()
    )
    assert len(stored) == 1
    assert "bob@example.com" not in stored[0].text
    assert "<EMAIL>" in stored[0].text


def test_cross_shard_dedup_store_keeps_first_and_is_idempotent(
    spark, landing
):
    """Shards re-deliver the same content under fresh doc_ids: the
    content-addressed store must hold each text ONCE with the
    smallest doc_id, survive a no-new-data restart unchanged, and
    admit only genuinely new content from later shards."""
    import pyarrow as pa, pyarrow.parquet as papq

    store = str(landing / "store")
    ckpt = str(landing / "ckpt3")

    def drain():
        corpus.run_gate_dedup_to_store(
            spark,
            corpus.quality_gated(
                corpus.document_stream(spark, str(landing / "landing"))
            ),
            store,
            ckpt,
        )
        return spark.read.parquet(store)

    first = drain()
    batch_keep = {
        r.doc_id
        for r in text_quality_rules(spark, SF_DIR_SMOKE)
        .filter("keep")
        .collect()
    }
    assert {r.doc_id for r in first.collect()} == batch_keep  # unique texts
    n_first = first.count()

    # a shard that re-delivers the first 30 docs under offset ids,
    # plus one genuinely new doc built to pass the gates
    t = papq.read_table(
        os.path.join(SF_DIR_SMOKE, "documents.parquet")
    ).slice(0, 30)
    t = t.set_column(
        t.schema.get_field_index("doc_id"),
        "doc_id",
        pa.array([v.as_py() + 5_000_000 for v in t["doc_id"]]),
    )
    papq.write_table(t, str(landing / "landing" / "shard-redeliver.parquet"))
    out = drain()
    # re-delivered content must NOT duplicate, and must keep the
    # ORIGINAL (smaller) doc_ids
    assert out.filter(F.col("doc_id") >= 5_000_000).count() == 0
    assert out.count() == n_first
    # replay with nothing new: byte-stable
    assert drain().count() == n_first
