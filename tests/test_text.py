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


def test_bpe_encode_piece_total_matches_token_counts(spark):
    """Conservation: the encode path's per-doc piece count (before
    the vocabulary roll-up) must equal text_bpe_tokens' n_bpe_tokens
    — the two queries share the replace chain but split/measure it
    differently, so agreement pins the split step."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    rep = text._bpe_rep(F.col("text"))
    pieces = F.split(
        F.expr("substring(_rep, 2, length(_rep) - 2)"), "\x03\x02"
    )
    per_doc = {
        r["doc_id"]: r["n"]
        for r in docs.withColumn("_rep", rep)
        .select("doc_id", F.explode(pieces).alias("piece"))
        .filter((F.col("piece") != "") & ~F.col("piece").rlike(r"^\s+$"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    counted = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in text.text_bpe_tokens(spark, SF_DIR_ORACLE).collect()
    }
    assert per_doc == counted


def test_chunk_plan_tiles_every_document(spark):
    """The closed-form plan must describe a valid tiling: the last
    chunk lands exactly on the document end ((n_chunks-1)*stride +
    last_len == n_tokens), every chunk is non-empty, and no doc
    needs a chunk the stride wouldn't reach."""
    from tests.conftest import SF_DIR_ORACLE

    rows = text.text_chunk_plan(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["last_chunk_tokens"] <= text.CHUNK_TOKENS
        if r["n_tokens"] <= text.CHUNK_TOKENS:
            assert r["n_chunks"] == 1
            assert r["last_chunk_tokens"] == r["n_tokens"]
        else:
            assert (
                (r["n_chunks"] - 1) * text.CHUNK_STRIDE
                + r["last_chunk_tokens"]
                == r["n_tokens"]
            )
        assert r["total_chunk_tokens"] == (
            (r["n_chunks"] - 1) * text.CHUNK_TOKENS
            + r["last_chunk_tokens"]
        )


def test_chunk_plan_matches_scalar_reimplementation(spark):
    """Independent Python chunker (the write-time explosion this
    plan budgets for) agrees doc-for-doc on a corpus sample."""
    from tests.conftest import SF_DIR_SMOKE

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_chunks"])
        for r in text.text_chunk_plan(spark, SF_DIR_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    for row in docs.collect():
        toks = row["text"].strip().split()
        starts = [0]
        while starts[-1] + text.CHUNK_TOKENS < len(toks):
            starts.append(starts[-1] + text.CHUNK_STRIDE)
        assert got[row["doc_id"]] == (len(toks), len(starts))


def test_readability_vs_oracle(spark, duck):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(
        text.text_readability(spark, SF_DIR_ORACLE),
        duck,
        text.ORACLES["text_readability"],
        name="text_readability",
    )


def test_readability_matches_pure_python(spark):
    """Recount words / vowel-group syllables / FORCAST inputs per
    source in plain Python and pin the exact integers plus the
    half-up displays."""
    import re as _re

    rows = (
        spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    agg = {}
    for r in rows:
        toks = r.text.strip().split()
        syls = [
            len(_re.findall(r"[aeiouy]+", t.lower())) for t in toks
        ]
        a = agg.setdefault(r.source, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += len(toks)
        a[2] += sum(syls)
        a[3] += sum(1 for s in syls if s == 1)
        a[4] += sum(1 for s in syls if s >= 3)
    got = text.text_readability(spark, SF_DIR_ORACLE).collect()
    assert {r.source for r in got} == set(agg)
    for r in got:
        n_docs, w, y, mono, poly = agg[r.source]
        assert (r.n_docs, r.n_words, r.n_syllables) == (n_docs, w, y)
        assert r.syll_per_word == ((y * 20000 + w) // (2 * w)) / 1e4
        assert r.complex_pct == ((100 * poly * 200 + w) // (2 * w)) / 1e2
        num = 20000 * w - 15000 * mono
        sign = -1 if num < 0 else 1
        assert r.forcast_grade == sign * ((abs(num) * 2 + w) // (2 * w)) / 1e3
        # FORCAST is bounded: grade in [5, 20] since 0 <= mono <= w
        assert 5.0 <= r.forcast_grade <= 20.0
