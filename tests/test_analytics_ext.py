import pytest
from bike_analyzer_spark.operators import analytics_ext
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

@pytest.mark.parametrize("name", sorted(analytics_ext.QUERIES))
def test_analytics_ext_vs_oracle(spark, duck, name):
    df = analytics_ext.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, analytics_ext.ORACLES[name], name=name)
