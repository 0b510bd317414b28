"""PII scrubbing: the corpus fixtures are PII-free (the driver row
verifies both engines agree on the zeros), so the actual redaction
mechanics are pinned here on planted rows — byte-exact scrubbed text,
per-class counts, and cross-engine parity of the oracle SQL on the
same planted data."""

import duckdb
import pytest

from bike_analyzer_spark.operators import scrub
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

PLANTED = [
    (0, "contact me at alice.smith+spam@example.co.uk for details"),
    (1, "docs at https://spark.apache.org/docs/latest/ are good"),
    (2, "call +1 (415) 555-0100 or 415-555-0199 tomorrow"),
    (3, "bob@x.io linked https://a.b/c?d=e and left 0800 123 4567"),
    (4, "nothing sensitive here at all"),
]

EXPECTED_CLEAN = {
    0: "contact me at <EMAIL> for details",
    1: "docs at <URL> are good",
    2: "call <PHONE> or <PHONE> tomorrow",
    3: "<EMAIL> linked <URL> and left <PHONE>",
    4: "nothing sensitive here at all",
}

EXPECTED_COUNTS = {
    0: (0, 1, 0),  # (urls, emails, phones)
    1: (1, 0, 0),
    2: (0, 0, 2),
    3: (1, 1, 1),
    4: (0, 0, 0),
}


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(PLANTED, "doc_id long, text string")


def test_planted_pii_is_redacted(spark, planted):
    rows = {r.doc_id: r for r in scrub.scrub_flags(planted).collect()}
    for i, clean in EXPECTED_CLEAN.items():
        assert rows[i].clean_text == clean, rows[i].clean_text
        assert (
            rows[i].n_urls,
            rows[i].n_emails,
            rows[i].n_phones,
        ) == EXPECTED_COUNTS[i]


def test_oracle_sql_agrees_on_planted_rows(spark, planted):
    """Run the SAME oracle SQL DuckDB-side over the planted rows: the
    two regex engines (Java vs RE2) must tokenize identically on
    realistic PII shapes, not just on the PII-free corpus."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in PLANTED)
        + ") t(doc_id, text)"
    )
    duck = {
        r[0]: r[1:]
        for r in con.execute(scrub.ORACLES["scrub_report"]).fetchall()
    }
    got = {
        r.doc_id: (r.n_urls, r.n_emails, r.n_phones, len(r.clean_text))
        for r in scrub.scrub_flags(planted).collect()
    }
    assert {k: tuple(v) for k, v in duck.items()} == got


def test_corpus_report_matches_oracle(spark, duck):
    assert_matches_oracle(
        scrub.scrub_report(spark, SF_DIR_ORACLE),
        duck,
        scrub.ORACLES["scrub_report"],
        name="scrub_report",
    )
