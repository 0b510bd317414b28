import pytest

from bike_analyzer_spark.operators import kpi

from .conftest import SF_DIR_ORACLE
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(kpi.QUERIES))
def test_kpi_matches_oracle(spark, duck, name):
    df = kpi.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, kpi.ORACLES[name], name)


def test_q1_single_row(spark):
    assert kpi.q1_network_summary(spark, SF_DIR_ORACLE).count() == 1


def test_q2_topk_bounded(spark, duck):
    # expected count derived from the oracle, not hard-coded
    expected = duck.sql(
        f"SELECT count(*) FROM ({kpi.ORACLES['q2_top10_value_ratio']})"
    ).fetchone()[0]
    got = kpi.q2_top10_value_ratio(spark, SF_DIR_ORACLE).count()
    assert 0 < got <= 10 and got == expected


def test_smoke_sf0001(spark):
    from .conftest import SF_DIR_SMOKE

    assert kpi.q2_top10_value_ratio(spark, SF_DIR_SMOKE).count() > 0


def test_f_json_vehicles_never_parses_at_the_scan(spark):
    """Regression guard for the explode-filter pushdown trap: with an
    inner explode, Catalyst infers `size(vehicles) > 0` and sinks it
    into the scan's data filters, where it evaluates from_json an
    EXTRA time per row. The explode_outer form must keep the scan
    filter-free of from_json (the parse then runs exactly once, in
    the projection)."""
    from tests.conftest import SF_DIR_ORACLE

    df = kpi.f_json_vehicles(spark, SF_DIR_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    assert scans and all("from_json" not in l for l in scans), plan
    filters = [l for l in plan.splitlines() if "Filter" in l and "from_json" in l]
    assert not filters, plan
