"""PII scrubbing — the redaction pass training pipelines run before
anything else touches raw text (emails, URLs, phone-shaped numbers →
typed placeholder tokens, the approach the Dolma/CCNet-style cleanup
stages document publicly).

Pure `regexp_replace` chains: narrow per-row projection, zero
shuffle, whole-stage codegen — at 100 TB this fuses into the same
scan as the quality gates. Patterns are deliberately conservative
(high precision): a missed phone number is recoverable by a later
pass, an over-eager pattern silently corrupts clean text forever.

The driver fixtures contain no PII, so the corpus query returns
all-zero counts (verified against the oracle like any other query —
both engines must agree on the zeros AND the byte-identical scrubbed
text lengths); the planted-PII mechanics are pinned by
tests/test_scrub.py on synthetic rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load

# order matters: emails before phones (an email's digits must not be
# half-eaten as a phone), URLs before emails would strip "user@" hosts
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"\+?\d[\d\s().-]{7,}\d"

EMAIL_TOKEN = "<EMAIL>"
URL_TOKEN = "<URL>"
PHONE_TOKEN = "<PHONE>"


def _count(col: Column, pat: str) -> Column:
    # idx=0 (whole match): Spark defaults to capture group 1 and the
    # patterns are group-free; DuckDB's regexp_extract_all defaults
    # to group 0 already
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast(
        "bigint"
    )


def scrub_text(col: Column) -> Column:
    """The redacted text: URL -> EMAIL -> PHONE, in that order."""
    out = F.regexp_replace(col, URL_RE, URL_TOKEN)
    out = F.regexp_replace(out, EMAIL_RE, EMAIL_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def scrub_flags(docs: DataFrame) -> DataFrame:
    """Counts per PII class + the scrubbed text, appended as columns
    (batch/stream agnostic, same contract as quality.rule_flags)."""
    t = F.col("text")
    return (
        docs.withColumn("n_urls", _count(t, URL_RE))
        .withColumn("n_emails", _count(t, EMAIL_RE))
        .withColumn("n_phones", _count(t, PHONE_RE))
        .withColumn("clean_text", scrub_text(t))
    )


def scrub_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document redaction report over the corpus: PII hit counts
    and the scrubbed-text length (length, not text, keeps the driver
    row compact; byte-level behavior is pinned by the planted-PII
    tests)."""
    return scrub_flags(load(spark, sf_dir, "documents")).select(
        "doc_id",
        "n_urls",
        "n_emails",
        "n_phones",
        F.length("clean_text").cast("bigint").alias("clean_len"),
    ).orderBy("doc_id")


QUERIES = {"scrub_report": scrub_report}

ORACLES = {
    "scrub_report": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{URL_RE}')) AS BIGINT)
                   AS n_urls,
               CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
                   AS n_phones,
               CAST(length(regexp_replace(regexp_replace(regexp_replace(
                   text, '{URL_RE}', '{URL_TOKEN}', 'g'),
                         '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g'),
                         '{PHONE_RE}', '{PHONE_TOKEN}', 'g')) AS BIGINT)
                   AS clean_len
        FROM documents ORDER BY doc_id
    """,
}
