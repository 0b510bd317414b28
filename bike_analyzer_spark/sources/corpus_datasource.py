"""`jsonlcorpus` — a Spark 4 Python DataSource WRITER for sharded
JSONL corpora, with a real two-phase commit.

`corpusio.write_jsonl` lands a corpus through Spark's built-in JSON
sink; this connector is the WRITER half of the custom-connector
surface (`gbfs_datasource.py` is the reader/stream half): it shows
the executor-parallel `DataSourceWriter.write` + driver-side
`commit`/`abort` protocol, and uses it to give JSONL landing the
publish semantics the built-in sink lacks —

* tasks write to `<path>/_staging/<write-id>/` (underscore-prefixed
  → invisible to every Spark file reader, including our own
  `corpusio.read_jsonl`);
* each task returns a `ShardCommit(file, n_rows)` message;
* ONLY the driver-side `commit` moves shards into place and then
  atomically replaces `_MANIFEST.json` (`os.replace`) — a reader
  either sees the old manifest or the new one, never a torn write;
* `abort` (any task failure) deletes the staging dir — no partial
  output can ever be published.

A speculative/zombie task's file simply stays in `_staging` unless
its commit message made it into `commit` — the manifest, not the
directory listing, is the source of truth (`manifest_shards` reads
it; a consistency test pins directory == manifest).

Usage:

    spark.dataSource.register(CorpusSinkDataSource)
    (df.write.format("jsonlcorpus").mode("overwrite""/""append")
       .save(path))

Values must be JSON-representable (ints/floats/strings/bools/None,
plus datetime/date → ISO strings, bytes → hex): the documents-table
types and anything like them. Scale: one shard per input partition,
written on the executors; the driver handles only file RENAMES and
the manifest (metadata-sized), exactly like a real table-format
commit protocol.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass
from datetime import date, datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"
_STAGING = "_staging"


@dataclass
class ShardCommit(WriterCommitMessage):
    file: str
    n_rows: int
    #: absolute staged path — commit messages are the ONLY reliable
    #: executor→driver channel (the runtime may re-instantiate the
    #: writer per task/batch, so instance state like a staging uuid
    #: does NOT survive the trip)
    staged: str = ""


def _jsonable(v):
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


class _Writer(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlcorpus: 'path' option is required")
        self.overwrite = overwrite
        # one write-id per job, minted on the DRIVER and pickled to
        # every task — all tasks stage under the same directory
        self.write_id = uuid.uuid4().hex

    # -- executors ---------------------------------------------------
    def write(self, iterator) -> ShardCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        stage_dir = os.path.join(self.path, _STAGING, self.write_id)
        os.makedirs(stage_dir, exist_ok=True)
        name = f"part-{ctx.partitionId():05d}-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(stage_dir, name)
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                d = {k: _jsonable(v) for k, v in row.asDict().items()}
                f.write(json.dumps(d) + "\n")
                n += 1
        return ShardCommit(file=name, n_rows=n, staged=staged)

    # -- driver ------------------------------------------------------
    def commit(self, messages) -> None:
        manifest_path = os.path.join(self.path, MANIFEST)
        shards: list[dict] = []
        if not self.overwrite and os.path.exists(manifest_path):
            with open(manifest_path) as f:
                shards = json.load(f)["shards"]
        elif self.overwrite:
            # drop every previously PUBLISHED shard (staging leftovers
            # of other writers are not ours to touch)
            if os.path.exists(manifest_path):
                with open(manifest_path) as f:
                    for s in json.load(f)["shards"]:
                        old = os.path.join(self.path, s["file"])
                        if os.path.exists(old):
                            os.remove(old)
        stage_dirs = set()
        for m in messages:
            stage_dirs.add(os.path.dirname(m.staged))
            os.replace(m.staged, os.path.join(self.path, m.file))
            shards.append({"file": m.file, "n_rows": m.n_rows})
        tmp = manifest_path + f".{self.write_id}.tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "shards": shards,
                    "n_rows_total": sum(s["n_rows"] for s in shards),
                    "write_id": self.write_id,
                },
                f,
            )
        os.replace(tmp, manifest_path)  # the atomic publish point
        for d in stage_dirs:
            shutil.rmtree(d, ignore_errors=True)

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None and m.staged:
                shutil.rmtree(
                    os.path.dirname(m.staged), ignore_errors=True
                )


class _StreamWriter(DataSourceStreamWriter):
    """Exactly-once streaming sink: the MANIFEST records which batch
    ids are committed, so a replayed micro-batch (restart re-runs the
    last epoch) publishes nothing the second time — the same
    manifest-is-truth idempotence as the batch writer, per epoch.
    Append-only by construction (a streaming corpus landing)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlcorpus: 'path' option is required")
        self.write_id = uuid.uuid4().hex

    # -- executors (one call per task per micro-batch) ---------------
    def write(self, iterator) -> ShardCommit:
        stage_dir = os.path.join(self.path, _STAGING, self.write_id)
        os.makedirs(stage_dir, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(stage_dir, name)
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                d = {k: _jsonable(v) for k, v in row.asDict().items()}
                f.write(json.dumps(d) + "\n")
                n += 1
        return ShardCommit(file=name, n_rows=n, staged=staged)

    # -- driver (once per micro-batch) -------------------------------
    def commit(self, messages, batchId: int) -> None:
        manifest_path = os.path.join(self.path, MANIFEST)
        stage_dirs = {
            os.path.dirname(m.staged)
            for m in messages
            if m is not None and m.staged
        }
        state = {"shards": [], "committed_batches": []}
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                state = json.load(f)
                state.setdefault("committed_batches", [])
        if batchId in state["committed_batches"]:
            # replayed epoch: the rows are already published — drop
            # the restaged files, publish nothing twice
            for d in stage_dirs:
                shutil.rmtree(d, ignore_errors=True)
            return
        for m in messages:
            if m is None:
                continue
            os.replace(m.staged, os.path.join(self.path, m.file))
            state["shards"].append(
                {"file": m.file, "n_rows": m.n_rows, "batch_id": batchId}
            )
        state["committed_batches"].append(batchId)
        state["n_rows_total"] = sum(s["n_rows"] for s in state["shards"])
        tmp = manifest_path + f".{self.write_id}.{batchId}.tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, manifest_path)  # atomic per-epoch publish
        for d in stage_dirs:
            shutil.rmtree(d, ignore_errors=True)

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m is not None and m.staged:
                shutil.rmtree(
                    os.path.dirname(m.staged), ignore_errors=True
                )


class CorpusSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlcorpus"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _Writer(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return _StreamWriter(self.options)


def manifest_shards(path: str) -> dict:
    """The published state of a jsonlcorpus directory — what a reader
    may rely on (staging files are never listed here)."""
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)
