"""BM25 ranked retrieval — the search/RAG-curation primitive the
LLM-pipeline pack lacked: score every document against a query term
set with Okapi BM25 and return the top-k.

Reference parity note: the reference app has no search; this extends
the brief's text-analysis family (quality/langid/tfidf already score
documents — BM25 is the corresponding RANKED retrieval operator used
to mine training corpora for topic-matched subsets).

Scale shape (the whole point of the formulation):

* NO corpus shuffle and NO explode. Per-document term frequencies
  for the (bounded, constant) query term set come from vectorized
  array expressions over the token array — one projection. The
  corpus-level statistics (N, total token count, per-term document
  frequencies) all ride ONE 1-row aggregate that broadcasts back
  over the scan, and the output is a TakeOrderedAndProject top-k.
  At 100 TB this is one pass over documents plus a 1-row exchange.

* EXACT cross-engine scoring. BM25's tf-side factor is rational for
  rational (k1, b):

      tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/S))

  with k1 = K1N/K1D and b = BN/BD clears to the integer ratio

      tf·(K1N+K1D)·BD·S  /  (tf·K1D·BD·S + K1N·(BD−BN)·S + K1N·BN·dl·N)

  (S = corpus token count, dl = doc length). Each term's idf is the
  ONE transcendental — ln((N − df + ½)/(df + ½) + 1) — quantized
  ONCE to integer micro-nats exactly like importance.py's
  log-ratios (same accepted ~1e-9 boundary class, documented there).
  A per-(doc, term) contribution is then the 128-bit integer
  half-up of (idf_unats · tf-ratio) — functions/exact.
  halfup_div_wide_sql — and the document score is an EXACT bigint
  sum of those integers: no accumulation-order risk anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import halfup_div_wide_sql
from ..functions.textfns import tokens
from ..sources.catalog import load

#: Okapi defaults as exact rationals: k1 = 1.2, b = 0.75
K1N, K1D = 6, 5
BN, BD = 3, 4
#: the fixed query (mixes the corpus's one rare term with common
#: ones, so idf contrast is non-degenerate at every SF)
QUERY_TERMS = ("dup", "hash", "join")
#: micro-nat quantization for idf (importance.py's discipline)
QUANT = 1_000_000
TOP_K = 20

_TOKS = "string_split_regex(trim(text), '\\s+')"


def _contrib(idf_col: str, tf_col: str) -> F.Column:
    """128-bit integer half-up of idf_unats * tf-ratio for one term
    (0 when the term is absent).

    The FIRST factor of every product chain widens to DECIMAL(38,0)
    BEFORE multiplying: `idf * tf * 44 * S` evaluated in bigint
    wraps once S reaches ~1e10 tokens (a ~50 GB corpus — far below
    the module's target scale), silently in non-ANSI Spark and as an
    overflow error in DuckDB. Same convention as
    tpch_top_supplier_share's share_pct (widen-then-multiply);
    pinned past 2^63 by tests/test_retrieval.py."""
    num = (
        f"CAST({idf_col} AS DECIMAL(38,0))"
        f" * {tf_col} * {(K1N + K1D) * BD} * _sdl"
    )
    den = (
        f"CAST({tf_col} AS DECIMAL(38,0)) * {K1D * BD} * _sdl"
        f" + CAST(_sdl AS DECIMAL(38,0)) * {K1N * (BD - BN)}"
        f" + CAST(dl AS DECIMAL(38,0)) * {K1N * BN} * _n"
    )
    return F.when(
        F.col(tf_col) > 0,
        F.expr(halfup_div_wide_sql(num, den, engine="spark")),
    ).otherwise(F.lit(0))


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dl, tf*, score_u) for every document with a positive
    BM25 score — the shared scoring frame behind `bm25_topk` and
    `rrf_fusion`."""
    docs = load(spark, sf_dir, "documents")
    toks = tokens("text")

    def _tf(term: str) -> F.Column:
        # NB: the lambda must be unary — a second parameter would make
        # pyspark pass the ELEMENT INDEX to it (higher-order filter
        # signature), not a closure slot
        return F.size(
            F.filter(toks, lambda x: x == F.lit(term))
        ).cast("long")

    tf_cols = {f"tf{i}": _tf(t) for i, t in enumerate(QUERY_TERMS)}
    # materialize the narrow per-doc stats frame (doc_id, dl, tfs —
    # ~5 longs vs the KB-scale text column): both the 1-row corpus
    # aggregate and the scoring projection consume it, and without
    # the checkpoint Catalyst re-runs the full text scan + tokenize
    # for each consumer
    d = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[c.alias(k) for k, c in tf_cols.items()],
    ).localCheckpoint(eager=False)
    stats = d.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("dl").alias("_sdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )
    for i in range(len(QUERY_TERMS)):
        # ln((N - df + 0.5)/(df + 0.5) + 1), micro-nat quantized ONCE
        stats = stats.withColumn(
            f"idf{i}",
            F.round(
                F.log(
                    (F.col("_n") - F.col(f"df{i}") + 0.5)
                    / (F.col(f"df{i}") + 0.5)
                    + 1
                )
                * QUANT
            ).cast("long"),
        )
    score_u = None
    for i in range(len(QUERY_TERMS)):
        c = _contrib(f"idf{i}", f"tf{i}")
        score_u = c if score_u is None else score_u + c
    return (
        d.crossJoin(F.broadcast(stats))
        .withColumn("score_u", score_u)
        .filter(F.col("score_u") > 0)
        .select(
            "doc_id",
            "dl",
            *[f"tf{i}" for i in range(len(QUERY_TERMS))],
            "score_u",
        )
    )


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} documents for QUERY_TERMS by BM25, ties broken on
    doc_id. Emits the exact integer micro-score plus per-term tfs
    (so the gate pins the whole decomposition, not just the
    ranking)."""
    return (
        bm25_scored(spark, sf_dir)
        .withColumn(
            "bm25", F.col("score_u") / F.lit(QUANT).cast("double")
        )
        .orderBy(F.desc("score_u"), "doc_id")
        .limit(TOP_K)
    )


QUERIES = {"bm25_topk": bm25_topk}


def _scored_ctes() -> str:
    """The `d/s/i/scored` CTE chain ending in the positive-score
    scored frame — shared by the bm25 and rrf oracles."""
    tf_sel = ",\n               ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(QUERY_TERMS)
    )
    df_sel = ",\n               ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{i}"
        for i in range(len(QUERY_TERMS))
    )
    idf_sel = ",\n               ".join(
        f"CAST(round(ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1)"
        f" * {QUANT}) AS BIGINT) AS idf{i}"
        for i in range(len(QUERY_TERMS))
    )
    # widen-then-multiply, mirroring _contrib: a bigint pre-multiply
    # would ERROR in DuckDB (and wrap in Spark) at large token counts
    contribs = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN "
        + halfup_div_wide_sql(
            f"CAST(idf{i} AS HUGEINT)"
            f" * tf{i} * {(K1N + K1D) * BD} * sdl",
            f"CAST(tf{i} AS HUGEINT) * {K1D * BD} * sdl"
            f" + CAST(sdl AS HUGEINT) * {K1N * (BD - BN)}"
            f" + CAST(dl AS HUGEINT) * {K1N * BN} * n",
            engine="duck",
        )
        + " ELSE 0 END)"
        for i in range(len(QUERY_TERMS))
    )
    tf_cols = ", ".join(f"tf{i}" for i in range(len(QUERY_TERMS)))
    return f"""
        d AS (
            SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS dl,
               {tf_sel}
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
        ),
        s AS (
            SELECT count(*) AS n,
               CAST(sum(dl) AS BIGINT) AS sdl,
               {df_sel}
            FROM d
        ),
        i AS (SELECT *, {idf_sel} FROM s),
        scored0 AS (
            SELECT doc_id, dl, {tf_cols},
                   ({contribs}) AS score_u
            FROM d, i
        ),
        scored AS (SELECT * FROM scored0 WHERE score_u > 0)
    """


def _oracle() -> str:
    tf_cols = ", ".join(f"tf{i}" for i in range(len(QUERY_TERMS)))
    return f"""
        WITH {_scored_ctes()}
        SELECT doc_id, dl, {tf_cols}, score_u,
               score_u / CAST({QUANT} AS DOUBLE) AS bm25
        FROM scored
        ORDER BY score_u DESC, doc_id
        LIMIT {TOP_K}
    """


ORACLES = {"bm25_topk": _oracle()}


#: RRF constant (Cormack et al.'s k=60) and pool/output sizes
RRF_K = 60
RRF_POOL = 100
RRF_TOP_K = 20

#: salt fan-out for the two-stage exact top-RRF_POOL rank (stage-2
#: global window then covers <= _RANK_SALTS * RRF_POOL rows)
_RANK_SALTS = 16


def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: the BM25 lexical
    ranking fused with a dense cosine ranking whose query vector is
    the TOP-1 BM25 document's embedding (pseudo-relevance feedback —
    "more like the best lexical hit"). Scores docs in either top-
    RRF_POOL list by

        rrf = sum over rankers of 1/(RRF_K + rank)

    with each reciprocal half-up-quantized ONCE to integer micro-
    units (the micro-nat discipline, but the operand is already
    rational so there is no boundary class at all: both engines
    compute the identical integer), summed exactly, divided once
    for display. A doc missing from a ranker's pool contributes 0
    (rank sentinel 0 — never NULL, which would break the oracle
    sort), the standard RRF treatment of unretrieved documents.

    The vec_id <-> doc_id identification is the testdata contract
    (`embeddings.vec_id` is the embedding of `documents.doc_id` —
    TESTDATA.md; ivf/semdedup rely on the same alignment).

    Scale shape: each ranker is one corpus pass ending in a SALTED
    two-stage top-RRF_POOL rank (per-salt window, then a global
    window over <= _RANK_SALTS*RRF_POOL survivors — never a
    corpus-global sort on one task); the fusion is a full outer
    join of two 100-row frames. The dense query side is a 1-row
    broadcast (plan-audited bounded BNLJ). At 100 TB the dense pool
    would ride the IVF/PQ index path instead of the brute-force
    pass — same fusion, cheaper candidate generation.

    Reference analog: none (no search in the reference) — this
    completes the retrieval family bm25_topk opened.
    """
    from pyspark.sql import Window

    from .similarity import _cosine_from, _dot, _with_norm

    def _salted_topn(df, id_col, order, rank_name):
        """Exact global top-RRF_POOL ranks WITHOUT a corpus-global
        window (the od_kcore lesson, r9 verdict ask #4): stage 1
        ranks within id-salted partitions and keeps each salt's top
        RRF_POOL (a row can only rank globally <= POOL if it ranks
        <= POOL within its own salt), stage 2 ranks the <=
        SALTS*POOL survivors — the only empty-partition window runs
        over a constant-bounded frame (audited by
        tests/test_plan_audit.py::_BOUNDED_GLOBAL_WINDOW_OK)."""
        w1 = Window.partitionBy("_salt").orderBy(*order)
        survivors = (
            df.withColumn("_salt", (F.col(id_col) % _RANK_SALTS).cast("int"))
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= RRF_POOL)
            .drop("_salt", "_rn")
        )
        w2 = Window.partitionBy().orderBy(*order)
        return survivors.withColumn(
            rank_name, F.row_number().over(w2)
        ).filter(F.col(rank_name) <= RRF_POOL)

    lexr = (
        _salted_topn(
            bm25_scored(spark, sf_dir),
            "doc_id",
            [F.desc("score_u"), F.asc("doc_id")],
            "rank_lex",
        )
        .select("doc_id", "rank_lex")
        .localCheckpoint(eager=False)
    )
    emb = _with_norm(load(spark, sf_dir, "embeddings"))
    qe = emb.join(
        lexr.filter(F.col("rank_lex") == 1).select("doc_id"),
        emb["vec_id"] == F.col("doc_id"),
    ).select(F.col("embedding").alias("qe"), F.col("norm").alias("qn"))
    cos = _cosine_from(
        _dot(F.col("qe"), F.col("embedding")), F.col("qn"), F.col("norm")
    )
    dense = _salted_topn(
        emb.crossJoin(F.broadcast(qe)).withColumn("cos", F.round(cos, 4)),
        "vec_id",
        [F.desc("cos"), F.asc("vec_id")],
        "rank_dense",
    ).select(F.col("vec_id").alias("doc_id"), "rank_dense")

    def _recip(rank: str) -> F.Column:
        return F.when(
            F.col(rank) > 0,
            F.expr(
                halfup_div_wide_sql(
                    str(QUANT), f"{RRF_K} + {rank}", engine="spark"
                )
            ),
        ).otherwise(F.lit(0).cast("long"))

    return (
        lexr.join(dense, "doc_id", "full_outer")
        .fillna({"rank_lex": 0, "rank_dense": 0})
        .withColumn(
            "rrf_u", _recip("rank_lex") + _recip("rank_dense")
        )
        .select(
            "doc_id",
            "rank_lex",
            "rank_dense",
            "rrf_u",
            (F.col("rrf_u") / F.lit(QUANT).cast("double")).alias("rrf"),
        )
        .orderBy(F.desc("rrf_u"), "doc_id")
        .limit(RRF_TOP_K)
    )


QUERIES["rrf_fusion"] = rrf_fusion


def _rrf_oracle() -> str:
    from .similarity import _cos_sql

    def recip(rank: str) -> str:
        return (
            f"CASE WHEN {rank} > 0 THEN "
            + halfup_div_wide_sql(
                str(QUANT), f"{RRF_K} + {rank}", engine="duck"
            )
            + " ELSE 0 END"
        )

    return f"""
        WITH {_scored_ctes()},
        lexr AS (
            SELECT doc_id, CAST(row_number() OVER (
                ORDER BY score_u DESC, doc_id) AS INT) AS rank_lex
            FROM scored
        ),
        lexp AS (SELECT * FROM lexr WHERE rank_lex <= {RRF_POOL}),
        q AS (
            SELECT embedding AS qe FROM embeddings
            WHERE vec_id = (SELECT doc_id FROM lexp WHERE rank_lex = 1)
        ),
        dcos AS (
            SELECT e.vec_id AS doc_id,
                   {_cos_sql("q.qe", "e.embedding")} AS cos
            FROM embeddings e, q
        ),
        denser AS (
            SELECT doc_id, CAST(row_number() OVER (
                ORDER BY cos DESC, doc_id) AS INT) AS rank_dense
            FROM dcos
        ),
        densep AS (SELECT * FROM denser WHERE rank_dense <= {RRF_POOL}),
        fused AS (
            SELECT coalesce(l.doc_id, p.doc_id) AS doc_id,
                   coalesce(l.rank_lex, 0) AS rank_lex,
                   coalesce(p.rank_dense, 0) AS rank_dense
            FROM lexp l FULL OUTER JOIN densep p ON l.doc_id = p.doc_id
        )
        SELECT doc_id, rank_lex, rank_dense,
               ({recip('rank_lex')}) + ({recip('rank_dense')}) AS rrf_u,
               (({recip('rank_lex')}) + ({recip('rank_dense')}))
                   / CAST({QUANT} AS DOUBLE) AS rrf
        FROM fused
        ORDER BY rrf_u DESC, doc_id
        LIMIT {RRF_TOP_K}
    """


ORACLES["rrf_fusion"] = _rrf_oracle()
