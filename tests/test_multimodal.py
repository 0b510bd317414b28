import pytest
from bike_analyzer_spark.operators import multimodal
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

@pytest.mark.parametrize("name", sorted(multimodal.QUERIES))
def test_multimodal_vs_oracle(spark, duck, name):
    df = multimodal.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, multimodal.ORACLES[name], name=name)

def test_real_decoder_gate():
    """No PIL in this container: the real-decoder gate must raise,
    never silently fall back to the fake."""
    with pytest.raises(ImportError):
        multimodal.real_decoder()

def test_custom_decoder_injection(spark):
    called = {"n": 0}
    def probe(payload):
        called["n"] += 1
        return 1, 2, 3, 4
    df = multimodal.decode_payloads(
        multimodal.payloads(spark, SF_DIR_ORACLE).limit(5), decoder=probe
    )
    rows = df.collect()
    assert len(rows) == 5 and all(tuple(r)[1:] == (1, 2, 3, 4) for r in rows)
