import pytest
from bike_analyzer_spark.operators import text
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle

@pytest.mark.parametrize("name", sorted(text.QUERIES))
def test_text_vs_oracle(spark, duck, name):
    df = text.QUERIES[name](spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, duck, text.ORACLES[name], name=name)


def _bpe_count_ref(doc: str) -> int:
    """Independent reference: classic per-token greedy BPE exactly as
    scripts/learn_bpe.py applies it during learning (symbol lists, no
    string-encoding trick). Guards the replace-chain encoding in
    text._bpe_pieces against boundary/overlap bugs."""
    n = 0
    for tok in doc.split():
        syms = list(tok)
        for a, b in text.BPE_MERGES:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
        n += len(syms)
    return n


def test_bpe_merge_semantics(spark):
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    rows = text.text_bpe_tokens(spark, SF_DIR_ORACLE).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert rows
    for r in rows:
        assert r["n_bpe_tokens"] == _bpe_count_ref(texts[r["doc_id"]]), r["doc_id"]


def test_bpe_merge_adjacency_edge_cases(spark):
    # [a,b,a,b] must merge to [ab,ab] (adjacent matches share no chars
    # in the wrapped encoding) and [e,r,r] to [er,r] (greedy leftmost,
    # no rescan of merged output).
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("x1", "erer"), ("x2", "err"), ("x3", "joinjoin hashhash")],
        "doc_id string, text string",
    )
    n_sym, n_ws = text._bpe_pieces(F.col("text"))
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", (n_sym - n_ws).alias("n")).collect()
    }
    assert got == {
        "x1": 2,  # er|er
        "x2": 2,  # er|r
        "x3": 4,  # join|join + hash|hash (whitespace not counted)
    }
    assert _bpe_count_ref("erer") == 2
    assert _bpe_count_ref("err") == 2
    assert _bpe_count_ref("joinjoin hashhash") == 4
