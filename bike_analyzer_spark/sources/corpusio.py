"""JSONL corpus I/O — the interchange format real training-data
pipelines live on (one JSON doc per line, usually gzipped, often with
a long tail of malformed lines from upstream scrapers).

Read path: schema-PINNED (never inferSchema — at 100 TB schema
inference is a full extra pass over the corpus) PERMISSIVE-mode
parse with a quarantine column: malformed lines land in
`_corrupt_record` instead of killing the job or being silently
dropped (FAILFAST / DROPMALFORMED respectively — both wrong for a
multi-TB ingest where a 1e-6 corruption rate is hundreds of bad
lines you want to AUDIT, not trip over). `read_jsonl` returns the
clean frame; `corrupt_lines` returns the quarantine for inspection
(see `_parsed` for why the scan is text + from_json rather than
spark.read.json). Gzip rides Spark's transparent codec handling (a
.jsonl.gz file reads the same — but is NOT splittable, so a
production layout shards into many moderate files rather than one
giant gz; `write_jsonl` writes that sharded layout).

Scale shape: a line-delimited scan parallelizes by file and by block
(uncompressed), projects only referenced fields from each JSON line,
and never touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA

#: quarantine column name (Spark's columnNameOfCorruptRecord)
CORRUPT_COL = "_corrupt_record"


def _with_quarantine(schema: T.StructType) -> T.StructType:
    """The read schema: user schema + the quarantine column (PERMISSIVE
    mode only captures malformed lines when the column is declared)."""
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def _parsed(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """TEXT scan + `from_json` against the pinned schema: (value, j)
    where j carries the parsed fields plus the quarantine column.

    Deliberately NOT `spark.read.json`: Spark refuses any query over
    a raw JSON scan that ends up referencing only the internal
    corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN) — which is exactly what a quarantine audit, or a
    count() over the cleaned frame, prunes down to; the documented
    workaround is caching the parsed frame, which is not a 100 TB
    plan. The text scan is the same splittable line read, each line
    parses exactly once, and Catalyst's OptimizeJsonExprs prunes the
    from_json schema to the referenced fields. Blank lines are
    skipped, matching the JSON reader's behavior."""
    parsed = F.from_json(
        F.col("value"),
        _with_quarantine(schema),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select("value", parsed.alias("j"))
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Clean documents from a JSONL path (file, dir, or glob;
    .gz transparent). Malformed lines are excluded here and visible
    via `corrupt_lines` — nothing is silently dropped at the scan."""
    schema = schema or TESTDATA["documents"]
    j = _parsed(spark, path, schema)
    return j.filter(F.col("j")[CORRUPT_COL].isNull()).select(
        *[F.col("j")[f.name].alias(f.name) for f in schema.fields]
    )


def corrupt_lines(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """The quarantine: raw text of every line the parser rejects —
    audit it, don't crash on it (FAILFAST) or hide it
    (DROPMALFORMED)."""
    schema = schema or TESTDATA["documents"]
    j = _parsed(spark, path, schema)
    return j.filter(F.col("j")[CORRUPT_COL].isNotNull()).select(
        F.col("value").alias(CORRUPT_COL)
    )


def write_jsonl(df: DataFrame, path: str, shards: int | None = None) -> None:
    """Land a corpus as sharded JSONL — the splittable many-file
    layout a downstream cluster reads in parallel (one giant .gz is
    the classic non-splittable single-task trap). `shards` defaults
    to the session's parallelism via a round-robin repartition only
    when the frame has fewer partitions."""
    if shards is not None:
        df = df.repartition(shards)
    elif df.rdd.getNumPartitions() < df.sparkSession.sparkContext.defaultParallelism:
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    df.write.mode("overwrite").json(path)
