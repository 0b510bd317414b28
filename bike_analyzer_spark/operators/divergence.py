"""Distribution diagnostics over the `documents` corpus — per-source
unigram entropy / KL against the corpus, and pairwise Jensen–Shannon
distance between sources.

Reference scope: the reference stops at per-table counts
(`sql/queries.sql`); a training-data pipeline deciding a domain mix
(`mixing.py` sets the weights) needs to know how DIFFERENT the
domains actually are — a near-duplicate pair of sources should not
both get full weight, and a source whose distribution sits far from
the corpus is the one worth upweighting. Entropy/KL/JSD over the
unigram distributions are the standard instruments.

Cross-engine exactness (the dsir/lm micro-nat discipline,
`importance.py:16-23`): every transcendental is quantized ONCE to
integer micro-nats — `round(ln(x)*1e6)` as bigint, shared-text in
both engines — then all aggregation is exact integer sums, and each
final statistic is ONE IEEE-double expression over those integers,
shared verbatim between the Spark query and the DuckDB oracle. The
only divergence class left is a ln() value within ~1e-9 of a .5
micro-nat boundary (accepted corpus-wide; same as dsir/lm/bm25).

The algebra that keeps everything integer until the last divide
(p_w = f_w/T domain, q_w = g_w/G corpus, L(x) = round(ln(x)*1e6)):

  H(p)      = ln T - (1/T)·Σ f·ln f          → (L(T) - Σf·L(f)/T)/1e6
  KL(p‖q)   = (Σf·L(f) - Σf·L(g))/T/1e6 - L(T)/1e6 + L(G)/1e6
  H(p,q)    = H + KL = (L(G) - Σf·L(g))/T... (emitted as its own expr)
  JSD(a,b)  : per co-occurring term, p/m = 2·fa·tb/(fa·tb+fb·ta) is a
              RATIO OF INTEGERS, so ln(p/m) = L(2·fa·tb) -
              L(fa·tb+fb·ta); a term present only in `a` contributes
              exactly fa·ln2, so the uncovered mass folds in as
              (ta - Σco fa)·L2 with L2 = round(ln(2)*1e6) = 693147.
              JSD = ½·KL(a‖m) + ½·KL(b‖m), all integer sums.

Overflow headroom (bigint, DuckDB errors loudly — the oracle is the
canary; Spark side would need ANSI mode or DECIMAL(38,0) to match):
  * Σ f·L(f) ≤ T·ln(T)·1e6 → safe through T ≈ 3·10¹¹ tokens/domain;
  * the JSD products fa·tb ≤ T² → safe through T ≈ 3·10⁹ tokens per
    domain. Past that, decompose L(2·fa·tb) = L2+L(fa)+L(tb) (exact
    ln identity; costs two extra ±0.5 micro-nat quantizations) — the
    mixed term L(fa·tb+fb·ta) is the one that then needs DECIMAL.

Scale shape: one corpus explode collapsed map-side into the
(source, term) table — Heaps-law sublinear in corpus bytes — then
every join/agg is vocabulary-sized: the entropy query joins the
per-source and corpus term tables on the term, the JSD query
self-joins the per-source table on the term (renamed sides — the
same-lineage alias trap is real) producing |sources|² candidate
pairs per term, i.e. work ∝ vocab·|S|², never corpus-sized. Totals
and the corpus scalar broadcast (|S| rows / 1 row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import tokens
from ..sources.catalog import load

_TOKS = "string_split_regex(trim(text), '\\s+')"

#: micro-nat quantizer — shared text, applied ONCE per transcendental
_L = "CAST(round(ln(CAST({} AS DOUBLE)) * 1000000) AS BIGINT)"

#: round(ln(2)*1e6): the per-token JSD contribution of uncovered mass
L2_UNATS = 693147

_D = "CAST({} AS DOUBLE)"

# final statistics — ONE double expression each, over exact integers,
# shared verbatim by both engines
_ENTROPY = (
    f"({_D.format(_L.format('t'))} - {_D.format('sfl')} / {_D.format('t')})"
    f" / {_D.format(1000000)}"
)
_KL = (
    f"(({_D.format('sfl - sfg')}) / {_D.format('t')}"
    f" - {_D.format(_L.format('t'))} + {_D.format('lg_unats')})"
    f" / {_D.format(1000000)}"
)
_CROSS = (
    f"({_D.format('lg_unats')} - {_D.format('sfg')} / {_D.format('t')})"
    f" / {_D.format(1000000)}"
)

# per-term JSD integrands over the renamed pair columns (fa,ta,fb,tb)
_JSD_TERM_A = (
    f"fa * ({_L.format('2 * fa * tb')} - {_L.format('fa * tb + fb * ta')})"
)
_JSD_TERM_B = (
    f"fb * ({_L.format('2 * fb * ta')} - {_L.format('fa * tb + fb * ta')})"
)
_JSD = (
    f"({_D.format(f'sa_sum + (ta - cov_a) * {L2_UNATS}')}"
    f" / {_D.format('ta')}"
    f" + {_D.format(f'sb_sum + (tb - cov_b) * {L2_UNATS}')}"
    f" / {_D.format('tb')})"
    f" / {_D.format(2000000)}"
)


def _source_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, w, f): per-source term frequencies — the Heaps-law
    sized table every statistic here reads. Lineage-truncated once:
    both queries consume it from TWO subtrees (corpus/total rollup +
    the term join), and without the checkpoint Catalyst re-runs the
    corpus explode per consumer (the shingle-frame lesson)."""
    return (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(tokens("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("f"))
        .localCheckpoint(eager=False)
    )


def domain_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: token/vocab counts, unigram Shannon entropy (nats),
    KL(source ‖ corpus), and the cross-entropy H(source, corpus)."""
    tf = _source_tf(spark, sf_dir)
    ctf = tf.groupBy("w").agg(F.sum("f").alias("g"))
    corpus = ctf.agg(
        F.expr(_L.format("sum(g)")).alias("lg_unats")
    )
    sums = (
        tf.join(ctf, "w")
        .groupBy("source")
        .agg(
            F.sum("f").alias("t"),
            F.count(F.lit(1)).alias("vocab_size"),
            F.expr(f"sum(f * {_L.format('f')})").alias("sfl"),
            F.expr(f"sum(f * {_L.format('g')})").alias("sfg"),
        )
    )
    return (
        sums.crossJoin(F.broadcast(corpus))
        .selectExpr(
            "source",
            "t AS n_tokens",
            "vocab_size",
            f"{_ENTROPY} AS entropy_nats",
            f"{_KL} AS kl_vs_corpus_nats",
            f"{_CROSS} AS cross_entropy_nats",
        )
        .orderBy("source")
    )


def domain_jsd_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All source pairs (sa < sb) with shared-term count and the
    Jensen–Shannon divergence (nats) between their unigram
    distributions. Explicit per-side renames — never alias() — for
    the same-lineage self-join (see module doc)."""
    tf = _source_tf(spark, sf_dir)
    tot = tf.groupBy("source").agg(F.sum("f").alias("t"))
    r = tf.join(F.broadcast(tot), "source")
    a = r.select(
        F.col("source").alias("sa"),
        "w",
        F.col("f").alias("fa"),
        F.col("t").alias("ta"),
    )
    b = r.select(
        F.col("source").alias("sb"),
        "w",
        F.col("f").alias("fb"),
        F.col("t").alias("tb"),
    )
    pairs = (
        a.join(b, "w")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb", "ta", "tb")
        .agg(
            F.count(F.lit(1)).alias("shared_terms"),
            F.sum("fa").alias("cov_a"),
            F.sum("fb").alias("cov_b"),
            F.expr(f"sum({_JSD_TERM_A})").alias("sa_sum"),
            F.expr(f"sum({_JSD_TERM_B})").alias("sb_sum"),
        )
    )
    return pairs.selectExpr(
        "sa", "sb", "shared_terms", f"{_JSD} AS jsd_nats"
    ).orderBy("sa", "sb")


QUERIES = {
    "domain_entropy": domain_entropy,
    "domain_jsd_pairs": domain_jsd_pairs,
}

_TF_CTE = f"""
    tf AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS f
        FROM (SELECT source, unnest({_TOKS}) AS w FROM documents)
        GROUP BY source, w
    )
"""

ORACLES = {
    "domain_entropy": f"""
        WITH {_TF_CTE},
        ctf AS (
            SELECT w, CAST(sum(f) AS BIGINT) AS g FROM tf GROUP BY w
        ),
        corpus AS (
            SELECT {_L.format('CAST(sum(g) AS BIGINT)')} AS lg_unats
            FROM ctf
        ),
        sums AS (
            SELECT source,
                   CAST(sum(f) AS BIGINT) AS t,
                   count(*) AS vocab_size,
                   CAST(sum(f * {_L.format('f')}) AS BIGINT) AS sfl,
                   CAST(sum(f * {_L.format('g')}) AS BIGINT) AS sfg
            FROM tf JOIN ctf USING (w)
            GROUP BY source
        )
        SELECT source, t AS n_tokens, vocab_size,
               {_ENTROPY} AS entropy_nats,
               {_KL} AS kl_vs_corpus_nats,
               {_CROSS} AS cross_entropy_nats
        FROM sums, corpus
        ORDER BY source
    """,
    "domain_jsd_pairs": f"""
        WITH {_TF_CTE},
        tot AS (
            SELECT source, CAST(sum(f) AS BIGINT) AS t
            FROM tf GROUP BY source
        ),
        r AS (
            SELECT tf.source, w, f, t FROM tf JOIN tot USING (source)
        ),
        sides AS (
            SELECT a.source AS sa, b.source AS sb, a.w AS w,
                   a.f AS fa, a.t AS ta, b.f AS fb, b.t AS tb
            FROM r a JOIN r b ON a.w = b.w AND a.source < b.source
        ),
        pairs AS (
            SELECT sa, sb, ta, tb,
                   count(*) AS shared_terms,
                   CAST(sum(fa) AS BIGINT) AS cov_a,
                   CAST(sum(fb) AS BIGINT) AS cov_b,
                   CAST(sum({_JSD_TERM_A}) AS BIGINT) AS sa_sum,
                   CAST(sum({_JSD_TERM_B}) AS BIGINT) AS sb_sum
            FROM sides
            GROUP BY sa, sb, ta, tb
        )
        SELECT sa, sb, shared_terms, {_JSD} AS jsd_nats
        FROM pairs
        ORDER BY sa, sb
    """,
}
