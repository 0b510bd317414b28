"""Association mining over the event stream — market-basket
co-occurrence of event types within (user, hour) baskets, with
support, confidence-free lift, and PMI per pair.

Reference scope: the reference's per-station aggregates
(`sql/queries.sql`) never relate two BEHAVIORS; "which actions
co-occur in the same session-hour" (the Apriori level-2 readout) is
the first association question a product warehouse asks, and the
same shape a recommender's co-visitation matrix needs.

Basket = (user_id, hour bucket): a per-user ALL-TIME basket is
degenerate here (every user eventually performs every event type as
the corpus grows — lift collapses to 1 everywhere), while the
hour-bucketed basket keeps item sets sparse at every SF.

Cross-engine exactness: supports are exact integer counts; lift =
N*c_xy / (c_x*c_y) rides `halfup_ratio_sql` (6 decimals, pure
bigint); PMI is quantized ONCE to integer micro-nats via the
shared-text double expression round(ln(D(c_xy)*D(N)/(D(c_x)*D(c_y)))
* 1e6) — the dsir/lm micro-nat discipline (`importance.py:16-23`),
displayed as the exact terminating double unats/1e6. The ln operand
is built from IEEE doubles (identical text, identical order), so no
integer product can overflow at any SF.

Scale shape: the basket-item table is DISTINCT(user, hour, type) —
one map-side-combinable dedup of the fact scan, shuffled on the
basket key. The pair table self-joins that frame on its basket key
(renamed sides — the same-lineage alias trap), with per-basket work
bounded by the item-domain squared (|types|^2, a constant), never
corpus-squared. Item counts, pair counts, and the basket total are
all domain-sized; the final report is |types|^2/2 rows. One
checkpoint shares the basket-item frame across the three consumers.
Skew: the shuffle key is (user, hour) — per-key cardinality is
bounded by the type domain, so no hot key exists by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import halfup_ratio_sql
from ..sources.catalog import load

#: micro-nat PMI, shared-text double expression over exact integers
_PMI_UNATS = (
    "CAST(round(ln(CAST(c_xy AS DOUBLE) * CAST(n_baskets AS DOUBLE)"
    " / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))) * 1000000)"
    " AS BIGINT)"
)

_FINAL = [
    "item_x",
    "item_y",
    "c_xy",
    "c_x",
    "c_y",
    "n_baskets",
    "{lift} AS lift",
    f"CAST({_PMI_UNATS} AS DOUBLE) / CAST(1000000 AS DOUBLE) AS pmi",
]


def _final(engine: str) -> list[str]:
    return [
        c.format(
            lift=halfup_ratio_sql("c_xy * n_baskets", "c_x * c_y", 6, engine)
        )
        for c in _FINAL
    ]


def event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per ordered event-type pair (x < y): baskets containing both,
    each item's basket count, the basket total, lift, and PMI."""
    items = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("h"),
            "event_type",
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_baskets = items.select("user_id", "h").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item_counts = items.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("c_item")
    )
    left = items.select(
        F.col("user_id").alias("u"),
        F.col("h").alias("hh"),
        F.col("event_type").alias("item_x"),
    )
    right = items.select(
        F.col("user_id").alias("u"),
        F.col("h").alias("hh"),
        F.col("event_type").alias("item_y"),
    )
    pairs = (
        left.join(right, ["u", "hh"])
        .where(F.col("item_x") < F.col("item_y"))
        .groupBy("item_x", "item_y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    cx = item_counts.select(
        F.col("event_type").alias("item_x"), F.col("c_item").alias("c_x")
    )
    cy = item_counts.select(
        F.col("event_type").alias("item_y"), F.col("c_item").alias("c_y")
    )
    return (
        pairs.join(F.broadcast(cx), "item_x")
        .join(F.broadcast(cy), "item_y")
        .crossJoin(F.broadcast(n_baskets))
        .selectExpr(*_final("spark"))
        .orderBy("item_x", "item_y")
    )


#: cosine over exact integer sums — ONE shared-text IEEE expression
#: (sqrt of a double is correctly rounded in both engines, so
#: identical integer inputs give bit-identical doubles)
_COS = (
    "CAST(dot AS DOUBLE)"
    " / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))"
)

_AFFINITY_FINAL = [
    "item_x",
    "item_y",
    "n_users_both",
    "dot",
    "sxx",
    "syy",
    f"{_COS} AS cosine",
]


def type_affinity_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine affinity between event types over per-user
    activity vectors — the co-visitation similarity a recommender's
    candidate generator starts from (each type is a vector indexed by
    user, components = that user's event count of the type).

    Cross-engine exactness: all three quadratic forms (dot = Σ
    u_x·u_y, ‖x‖² = Σ u_x², ‖y‖² = Σ u_y²) are EXACT integer sums of
    per-user integer counts, so they are partition-order invariant;
    cosine is ONE shared-text double expression over them (stats.py's
    power-sum discipline). Overflow headroom: per-user per-type
    counts c satisfy Σc² ≤ (Σc)·max(c); at ~10⁴ events/user·type the
    norm sums stay under 2⁶³ through ~10¹¹ users — far past 100 TB
    (and the DuckDB twin errors loudly on bigint overflow, so the
    oracle is the canary).

    Scale shape: one map-side-combinable groupBy(user, type) collapses
    the corpus to the user-vector frame (≤ |types| rows per user);
    norms are a domain-sized rollup of that frame; the dot products
    self-join it on user_id with per-key fanout bounded by |types|²
    (a constant — no hot key can exist), then collapse to the
    |types|²/2-row report. One lazy checkpoint shares the vector
    frame across both consumers; nothing downstream of the first
    aggregate is corpus-sized.
    """
    vecs = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    norms = vecs.groupBy("event_type").agg(
        F.expr("sum(c * c)").alias("nrm")
    )
    left = vecs.select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("item_x"),
        F.col("c").alias("cx"),
    )
    right = vecs.select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("item_y"),
        F.col("c").alias("cy"),
    )
    pairs = (
        left.join(right, "u")
        .where(F.col("item_x") < F.col("item_y"))
        .groupBy("item_x", "item_y")
        .agg(
            F.count(F.lit(1)).alias("n_users_both"),
            F.expr("sum(cx * cy)").alias("dot"),
        )
    )
    nx = norms.select(
        F.col("event_type").alias("item_x"), F.col("nrm").alias("sxx")
    )
    ny = norms.select(
        F.col("event_type").alias("item_y"), F.col("nrm").alias("syy")
    )
    return (
        pairs.join(F.broadcast(nx), "item_x")
        .join(F.broadcast(ny), "item_y")
        .selectExpr(*_AFFINITY_FINAL)
        .orderBy("item_x", "item_y")
    )


QUERIES = {
    "event_cooccurrence": event_cooccurrence,
    "type_affinity_cosine": type_affinity_cosine,
}

ORACLES = {
    "event_cooccurrence": f"""
        WITH items AS (
            SELECT DISTINCT user_id,
                   date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                   event_type
            FROM events
        ),
        n AS (
            SELECT count(*) AS n_baskets
            FROM (SELECT DISTINCT user_id, h FROM items)
        ),
        ic AS (
            SELECT event_type, count(*) AS c_item
            FROM items GROUP BY event_type
        ),
        pairs AS (
            SELECT a.event_type AS item_x, b.event_type AS item_y,
                   count(*) AS c_xy
            FROM items a
            JOIN items b
              ON a.user_id = b.user_id AND a.h = b.h
             AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT {', '.join(_final('duck'))}
        FROM (
            SELECT p.item_x, p.item_y, p.c_xy,
                   cx.c_item AS c_x, cy.c_item AS c_y, n.n_baskets
            FROM pairs p
            JOIN ic cx ON cx.event_type = p.item_x
            JOIN ic cy ON cy.event_type = p.item_y
            CROSS JOIN n
        )
        ORDER BY item_x, item_y
    """,
    "type_affinity_cosine": f"""
        WITH vecs AS (
            SELECT user_id, event_type,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        norms AS (
            SELECT event_type, CAST(sum(c * c) AS BIGINT) AS nrm
            FROM vecs GROUP BY event_type
        ),
        pairs AS (
            SELECT a.event_type AS item_x, b.event_type AS item_y,
                   CAST(count(*) AS BIGINT) AS n_users_both,
                   CAST(sum(a.c * b.c) AS BIGINT) AS dot
            FROM vecs a
            JOIN vecs b
              ON a.user_id = b.user_id
             AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT {', '.join(_AFFINITY_FINAL)}
        FROM (
            SELECT p.item_x, p.item_y, p.n_users_both, p.dot,
                   nx.nrm AS sxx, ny.nrm AS syy
            FROM pairs p
            JOIN norms nx ON nx.event_type = p.item_x
            JOIN norms ny ON ny.event_type = p.item_y
        )
        ORDER BY item_x, item_y
    """,
}
