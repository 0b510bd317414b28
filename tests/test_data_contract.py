"""Data-contract guard for the events table (VERDICT r5 #4).

Round 5 postmortem: the driver regenerated testdata with events.ts as
parquet TIMESTAMP(MICROS) while the loader hard-assumed raw nanos, so
22 queries silently produced plausible-shaped wrong answers (every
event timestamp collapsed into ~26 minutes of January 1970). Nothing
pointed at the loader — 26 tests went red with no obvious common cause.

This module is the single obvious place a ts-unit drift should fail:
if the loader's unit handling breaks again, THESE tests go red first
and name the contract violated.
"""

import datetime

from bike_analyzer_spark.sources import catalog
from tests.conftest import SF_DIR_ORACLE, SF_DIR_SMOKE


def test_footer_unit_is_supported():
    """The sniffed footer unit must be one the loader handles; a new
    physical layout (e.g. int96, string) should fail HERE, not as 26
    downstream value mismatches."""
    for sf_dir in (SF_DIR_SMOKE, SF_DIR_ORACLE):
        unit = catalog.events_ts_unit(sf_dir)
        assert unit in ("s", "ms", "us", "ns", "int64"), (
            f"{sf_dir}: unhandled events.ts physical unit {unit!r} — "
            "extend catalog._events_read_schema before shipping"
        )


def test_loaded_ts_lands_in_2024(spark):
    """min(ts) of the loaded events table must be a 2024 wall-clock
    instant. A wrong unit scales timestamps by 1000x: nanos-read-as-
    micros lands in 1970, micros-read-as-nanos lands past year 3000 —
    either way this assertion, and only this assertion, pinpoints it.
    """
    lo, hi = (
        catalog.load(spark, SF_DIR_SMOKE, "events")
        .selectExpr("min(ts)", "max(ts)")
        .first()
    )
    assert lo.year == 2024, f"min(events.ts) = {lo!r}; unit drift in loader"
    assert hi.year == 2024, f"max(events.ts) = {hi!r}; unit drift in loader"
    assert hi - lo > datetime.timedelta(days=1), (
        f"events span {hi - lo} — a collapsed range means the loader "
        "divided the native unit (r5 bug signature)"
    )


def test_spark_ts_matches_duckdb_oracle(spark, duck):
    """The oracle reads the parquet natively; Spark must agree on the
    exact same instants (this is what hash-gates every derived bucket,
    session, and hour string downstream)."""
    s_lo, s_hi = (
        catalog.load(spark, SF_DIR_ORACLE, "events")
        .selectExpr("min(ts)", "max(ts)")
        .first()
    )
    d_lo, d_hi = duck.execute(
        "SELECT CAST(min(ts) AS TIMESTAMP), CAST(max(ts) AS TIMESTAMP)"
        " FROM events"
    ).fetchone()
    assert (s_lo, s_hi) == (d_lo, d_hi)
