"""JSONL corpus I/O: schema pinning, corrupt-line quarantine, gzip
transparency, and the sharded round-trip."""

import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.sources import corpusio
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_SMOKE

GOOD = [
    {"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0",
     "n_chars": 11},
    {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1",
     "n_chars": 7},
    {"doc_id": 3, "text": "hola", "lang": "es", "source": "s0",
     "n_chars": 4},
]
BAD = ['{"doc_id": 4, "text": "truncated', "not json at all", "{]"]


def _write_fixture(path, good, bad, gz=False):
    lines = [json.dumps(g) for g in good]
    # interleave corrupt lines between valid ones
    for i, b in enumerate(bad):
        lines.insert(i * 2 + 1, b)
    data = "\n".join(lines) + "\n"
    if gz:
        with gzip.open(path, "wt") as f:
            f.write(data)
    else:
        with open(path, "w") as f:
            f.write(data)


def test_clean_read_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "corpus.jsonl")
    _write_fixture(p, GOOD, BAD)
    df = corpusio.read_jsonl(spark, p)
    assert df.columns == [f.name for f in load(
        spark, SF_DIR_SMOKE, "documents").schema.fields]
    rows = {r.doc_id: r.text for r in df.collect()}
    assert rows == {1: "hello world", 2: "bonjour", 3: "hola"}
    bad = [r[corpusio.CORRUPT_COL] for r in
           corpusio.corrupt_lines(spark, p).collect()]
    assert sorted(bad) == sorted(BAD)


def test_gzip_reads_transparently(spark, tmp_path):
    p = str(tmp_path / "corpus.jsonl.gz")
    _write_fixture(p, GOOD, BAD, gz=True)
    assert corpusio.read_jsonl(spark, p).count() == len(GOOD)
    assert corpusio.corrupt_lines(spark, p).count() == len(BAD)


def test_sharded_round_trip(spark, tmp_path):
    src = load(spark, SF_DIR_SMOKE, "documents")
    out = str(tmp_path / "sharded")
    corpusio.write_jsonl(src, out, shards=6)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 6
    back = corpusio.read_jsonl(spark, out)
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    assert corpusio.corrupt_lines(spark, out).count() == 0


def test_schema_is_pinned_not_inferred(spark, tmp_path):
    """A line whose doc_id is a string must quarantine, not widen the
    column (inference would have unified to string)."""
    p = str(tmp_path / "typed.jsonl")
    _write_fixture(p, GOOD, ['{"doc_id": "oops", "text": "x"}'])
    df = corpusio.read_jsonl(spark, p)
    assert dict(df.dtypes)["doc_id"] == "bigint"
    assert df.count() == len(GOOD)
    assert corpusio.corrupt_lines(spark, p).count() == 1
