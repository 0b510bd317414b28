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


def test_q2_topk_is_10(spark):
    assert kpi.q2_top10_value_ratio(spark, SF_DIR_ORACLE).count() == 10
