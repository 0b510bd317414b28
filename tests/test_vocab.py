"""Corpus vocabulary statistics: oracle parity plus internal
consistency between the summary and the head."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.operators import vocab
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(vocab.QUERIES))
def test_vocab_vs_oracle(spark, duck, name):
    df = vocab.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, vocab.ORACLES[name], name=name)


def test_summary_consistent_with_term_table(spark):
    """The 1-row summary must agree with a direct recount of the
    vocabulary-sized term table it aggregates."""
    s = vocab.vocab_summary(spark, SF_DIR_ORACLE).collect()[0]
    tf = vocab._term_freqs(spark, SF_DIR_ORACLE).collect()
    assert s.vocab_size == len(tf)
    assert s.total_tokens == sum(r.freq for r in tf)
    assert s.hapax_count == sum(1 for r in tf if r.freq == 1)
    assert 0 < s.type_token_ratio < 1
    assert s.hapax_count < s.vocab_size


def test_head_is_ranked_and_bounded(spark):
    rows = vocab.vocab_top_terms(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == vocab.TOP_TERMS
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    # Zipf head: the most frequent term carries a visible ppm share
    assert rows[0].ppm > rows[-1].ppm > 0
