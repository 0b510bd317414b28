"""Cross-engine contract tests: the Spark column primitives in
functions/textfns must agree byte-for-byte with their DuckDB SQL
twins on adversarial inputs, not just the clean documents corpus."""

import random

import duckdb
from pyspark.sql import functions as F

from bike_analyzer_spark.functions import textfns

EDGE = [
    "single",
    "two words",
    "  leading and trailing  ",
    "tab\tseparated\ttokens here",
    "newline\nin the middle",
    "multiple   internal    spaces",
    "unicode café açaí 北京 words",
    "punct, words! with? marks; here",
    "numbers 123 456.789 mixed",
    "a b c d e f g h i j",
]

def _corpus():
    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "délta", "epsilon", "x1", "y2"]
    out = list(EDGE)
    for _ in range(80):
        out.append(" ".join(rng.choice(words) for _ in range(rng.randint(1, 12))))
    return out

def test_hash_tokens_shingles_parity(spark):
    corpus = _corpus()
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)],
                                "id long, text string")
    sres = (
        sdf.withColumn("toks", textfns.tokens("text"))
        .select(
            "id",
            textfns.hash64(F.col("text")).alias("h"),
            textfns.hash64(F.col("text"), salt="7").alias("hs"),
            F.col("toks"),
            textfns.shingle_exprs("toks", 3).alias("sh"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, t) for i, t in enumerate(corpus)])
    toks = "string_split_regex(trim(text), '\\s+')"
    dres = con.sql(f"""
        SELECT id, {textfns.hash64_duck('text')} AS h,
               {textfns.hash64_duck('text', "'7'")} AS hs,
               {toks} AS toks,
               {textfns.shingles_duck(toks, 3)} AS sh
        FROM t ORDER BY id
    """).fetchall()
    for s, d in zip(sorted(sres, key=lambda r: r.id), dres):
        assert s.h == d[1], (s, d)
        assert s.hs == d[2], (s, d)
        assert list(s.toks) == d[3], (corpus[s.id], s.toks, d[3])
        assert list(s.sh) == d[4], (corpus[s.id], s.sh, d[4])
