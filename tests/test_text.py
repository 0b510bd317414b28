import pytest
from bike_analyzer_spark.operators import text
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

@pytest.mark.parametrize("name", sorted(text.QUERIES))
def test_text_vs_oracle(spark, duck, name):
    df = text.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, text.ORACLES[name], name=name)
