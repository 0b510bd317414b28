"""Analytics extensions beyond the reference's surface (SURVEY.md §2.7
notes the engine exposes set ops "for free"; rollup/percentile/ntile
round out the analytic SQL surface a user migrating a warehouse
workload expects). All stock Catalyst operators, all oracle-checked.

Scale shapes: set ops compile to hash aggregates/joins (distinct on
the union key); ROLLUP is one pass with grouping-set expansion (no
extra scans); ntile is a single window over an explicit total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import cents, halfup_avg_sql
from ..sources.catalog import load


def set_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: intersect / except / union-distinct cardinalities of the
    purchase-user and view-user sets."""
    events = load(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select("user_id")
    v = events.filter(F.col("event_type") == "view").select("user_id")
    rows = [
        ("intersect", p.intersect(v)),
        ("except_p_minus_v", p.subtract(v)),  # EXCEPT (distinct) semantics
        ("union_distinct", p.union(v).distinct()),
    ]
    out = None
    for name, df in rows:
        one = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("op"), "n_users"
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("op")


def rollup_by_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (event_type, hour): per-cell, per-type subtotal and
    grand total in ONE pass (grouping-set expansion, no extra scans)."""
    events = load(spark, sf_dir, "events")
    return (
        events.withColumn("hour", F.date_format("ts", "HH"))
        .rollup("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("hour", F.lit("<all>")).alias("hour"),
            "n",
            "sum_value",
        )
        .orderBy("event_type", "hour")
    )


def ntile_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) per event_type over (value, event_id) — per-type
    quartile aggregates. Partitioned by type so no single task sees
    the whole table (an UN-partitioned ntile is a one-partition global
    sort — the plan shape this repo rejects; a truly global ntile at
    scale would need range partitioning + prefix counts, and usually
    percentile boundaries answer the question anyway)."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value"), F.col("event_id")
    )
    return (
        events.withColumn("q", F.ntile(4).over(w))
        .groupBy("event_type", "q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.sum(cents(F.col("value"))).alias("_c"),
        )
        # exact integer-cents half-up mean (functions.exact)
        .selectExpr(
            "event_type", "q", "n", "min_value", "max_value",
            halfup_avg_sql("_c", "n") + " AS avg_value",
        )
        .orderBy("event_type", "q")
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_hour_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour x event-type counts, pivoted to one column per type. The
    pivot VALUES are declared (not discovered) so the plan is a single
    pass with no extra distinct-scan and stable output schema."""
    events = load(spark, sf_dir, "events")
    return (
        events.withColumn("hour", F.date_format("ts", "HH"))
        .groupBy("hour")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("hour")
    )


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of event value per type (Spark
    `percentile` == DuckDB `quantile_cont`, both linear interpolation
    over the sorted set)."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "set_ops_suite": set_ops_suite,
    "rollup_by_type_hour": rollup_by_type_hour,
    "ntile_value_quartiles": ntile_value_quartiles,
    "pivot_hour_by_type": pivot_hour_by_type,
    "value_percentiles": value_percentiles,
}

ORACLES = {
    "set_ops_suite": """
        WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
             v AS (SELECT user_id FROM events WHERE event_type = 'view')
        SELECT 'intersect' AS op,
               (SELECT count(*) FROM (SELECT user_id FROM p
                INTERSECT SELECT user_id FROM v)) AS n_users
        UNION ALL
        SELECT 'except_p_minus_v',
               (SELECT count(*) FROM (SELECT user_id FROM p
                EXCEPT SELECT user_id FROM v))
        UNION ALL
        SELECT 'union_distinct',
               (SELECT count(*) FROM (SELECT user_id FROM p
                UNION SELECT user_id FROM v))
        ORDER BY op
    """,
    "rollup_by_type_hour": """
        SELECT coalesce(event_type, '<all>') AS event_type,
               coalesce(hour, '<all>') AS hour,
               count(*) AS n,
               round(sum(value), 4) AS sum_value
        FROM (SELECT event_type, strftime(ts, '%H') AS hour, value
              FROM events)
        GROUP BY ROLLUP (event_type, hour)
        ORDER BY event_type, hour
    """,
    "pivot_hour_by_type": """
        SELECT strftime(ts, '%H') AS hour,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS BIGINT) AS signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS view
        FROM events
        GROUP BY 1
        ORDER BY hour
    """,
    "value_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "ntile_value_quartiles": f"""
        WITH t AS (
            SELECT event_type, value,
                   ntile(4) OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS q
            FROM events
        )
        SELECT event_type, q, n, min_value, max_value,
               {halfup_avg_sql("_c", "n", engine="duck")} AS avg_value
        FROM (
            SELECT event_type, CAST(q AS INT) AS q,
                   count(*) AS n,
                   round(min(value), 4) AS min_value,
                   round(max(value), 4) AS max_value,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS _c
            FROM t GROUP BY event_type, q
        )
        ORDER BY event_type, q
    """,
}


def value_reversals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern mining over each user's value series — the
    MATCH_RECOGNIZE `PATTERN (DOWN+ UP+)` shape, emulated with the
    gaps-and-islands idiom Spark actually executes: per user, count
    V-reversals (strict local minima), peaks (strict local maxima),
    and the longest strict down-run / up-run.

    Mechanics: direction = sign(v - lag(v)) per step over the
    (ts, event_id) total order; a valley is dir = -1 followed by
    dir = +1 (lead); runs are islands keyed by
    rn - row_number-within-(user, dir) — the standard consecutive-
    group trick (`busy_islands`' sibling, here over a value series
    instead of station status). Ties (dir = 0) break runs and can't
    fake extrema — strictness is the sign function itself.

    Exactness: directions compare exact integer CENTS, counts and
    run lengths are integers — nothing to quantize.

    Scale shape: ONE shuffle on user_id; every window
    (lag/lead/row_number twice) reuses that single partitioning,
    then one per-user aggregate. Output is user-cardinality.
    """
    rn_u = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    ev = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            cents(F.col("value")).alias("v"),
        )
        .withColumn("rn", rn_u)
        .withColumn(
            "dir",
            F.expr(
                "CAST(sign(v - lag(v) OVER (PARTITION BY user_id"
                " ORDER BY ts, event_id)) AS INT)"
            ),
        )
        .withColumn(
            "next_dir",
            F.lead("dir").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
    )
    runs = (
        ev.where(F.col("dir").isin(-1, 1))
        .withColumn(
            "isl",
            F.col("rn")
            - F.row_number().over(
                Window.partitionBy("user_id", "dir").orderBy("rn")
            ),
        )
        .groupBy("user_id", "dir", "isl")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("dir") == -1, F.col("run_len"))
            ).alias("max_down_run"),
            F.max(
                F.when(F.col("dir") == 1, F.col("run_len"))
            ).alias("max_up_run"),
        )
    )
    extrema = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(
            (
                (F.col("dir") == -1) & (F.col("next_dir") == 1)
            ).cast("long")
        ).alias("n_valleys"),
        F.sum(
            (
                (F.col("dir") == 1) & (F.col("next_dir") == -1)
            ).cast("long")
        ).alias("n_peaks"),
    )
    return (
        extrema.join(runs, "user_id", "left")
        .fillna({"max_down_run": 0, "max_up_run": 0})
        .orderBy("user_id")
    )


QUERIES["value_reversals"] = value_reversals

ORACLES["value_reversals"] = """
    WITH ev0 AS (
        SELECT user_id, ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS v,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn
        FROM events
    ),
    ev AS (
        SELECT *, CAST(sign(v - lag(v) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               )) AS INT) AS dir
        FROM ev0
    ),
    ev2 AS (
        SELECT *, lead(dir) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_dir
        FROM ev
    ),
    runs AS (
        SELECT user_id,
               max(CASE WHEN dir = -1 THEN run_len END)
                   AS max_down_run,
               max(CASE WHEN dir = 1 THEN run_len END) AS max_up_run
        FROM (
            SELECT user_id, dir,
                   CAST(count(*) AS BIGINT) AS run_len
            FROM (
                SELECT user_id, dir, rn,
                       rn - row_number() OVER (
                           PARTITION BY user_id, dir ORDER BY rn
                       ) AS isl
                FROM ev2 WHERE dir IN (-1, 1)
            )
            GROUP BY user_id, dir, isl
        )
        GROUP BY user_id
    ),
    extrema AS (
        SELECT user_id,
               count(*) AS n_points,
               CAST(sum(CASE WHEN dir = -1 AND next_dir = 1
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_valleys,
               CAST(sum(CASE WHEN dir = 1 AND next_dir = -1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks
        FROM ev2
        GROUP BY user_id
    )
    SELECT e.user_id AS user_id, n_points, n_valleys, n_peaks,
           coalesce(max_down_run, 0) AS max_down_run,
           coalesce(max_up_run, 0) AS max_up_run
    FROM extrema e LEFT JOIN runs USING (user_id)
    ORDER BY user_id
"""


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand SKYLINE (Pareto frontier) of parts: the parts not
    STRICTLY dominated on (retail price down, size up) — no other
    same-brand part is at-most-as-expensive AND at-least-as-big
    while strictly better on one axis. The skyline operator is the
    classic "best value-for-money shortlist" missing from plain SQL
    surfaces; per-brand partitioning is both the useful grain and
    the scale-safe one (a GLOBAL skyline would need one corpus-wide
    sort — per-brand windows shuffle on the brand key instead).

    The 2-D frontier needs no pairwise join: order each brand by
    price cents, then a part survives iff (a) no strictly cheaper
    part matches its size — running MAX(size) over the
    integer-valued RANGE frame `UNBOUNDED PRECEDING TO 1 PRECEDING`
    on price, the frame both engines define identically — and (b)
    no equal-priced part strictly exceeds its size (the per-price
    partition max). Equal (price, size) twins both survive, per the
    strict-domination definition. Everything compares exact integer
    cents, so the frontier membership test is exact.
    """
    w_lt = (
        Window.partitionBy("p_brand")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy("p_brand", "price_c")
    return (
        load(spark, sf_dir, "part")
        .select(
            "p_partkey",
            "p_brand",
            "p_size",
            cents(F.col("p_retailprice")).alias("price_c"),
        )
        .withColumn("max_lt", F.max("p_size").over(w_lt))
        .withColumn("max_eq", F.max("p_size").over(w_eq))
        .where(
            (F.col("max_lt").isNull() | (F.col("max_lt") < F.col("p_size")))
            & (F.col("max_eq") == F.col("p_size"))
        )
        .selectExpr(
            "p_brand",
            "p_partkey",
            "p_size",
            "CAST(price_c AS DOUBLE) / CAST(100 AS DOUBLE)"
            " AS retail_price",
        )
        .orderBy("p_brand", "price_c", "p_partkey")
    )


QUERIES["skyline_parts"] = skyline_parts

ORACLES["skyline_parts"] = """
    WITH p AS (
        SELECT p_partkey, p_brand, p_size,
               CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
        FROM part
    ),
    m AS (
        SELECT *,
               max(p_size) OVER (
                   PARTITION BY p_brand ORDER BY price_c
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS max_lt,
               max(p_size) OVER (
                   PARTITION BY p_brand, price_c
               ) AS max_eq
        FROM p
    )
    SELECT p_brand, p_partkey, p_size,
           CAST(price_c AS DOUBLE) / CAST(100 AS DOUBLE)
               AS retail_price
    FROM m
    WHERE (max_lt IS NULL OR max_lt < p_size)
      AND max_eq = p_size
    ORDER BY p_brand, price_c, p_partkey
"""


def monthly_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order revenue with the year-over-year change — the
    KPI-trend header of every finance dashboard: per calendar
    month, exact-cents revenue, order count, and the half-up YoY
    percentage against the same month one year earlier (NULL for
    the first year and for months whose prior-year twin is absent).

    The lag is BY CALENDAR MONTH, not row offset: a self-join on
    month = month - 1 YEAR, so a missing month can never shift the
    comparison (the add_months arithmetic is identical in both
    engines). Scale shape: one map-side-combinable month rollup
    (bounded by the date span), then a months-sized self-join —
    corpus work is the single scan.
    """
    from ..functions.exact import cents, halfup_signed_ratio_sql

    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).alias("rev_c"),
        )
        .localCheckpoint(eager=False)
    )
    prior = monthly.select(
        F.expr("add_months(month, 12)").alias("month"),
        F.col("rev_c").alias("prior_c"),
    )
    yoy = halfup_signed_ratio_sql(
        "100 * (rev_c - prior_c)", "prior_c", 2, "spark"
    )
    return (
        monthly.join(prior, "month", "left")
        .selectExpr(
            "month",
            "n_orders",
            "CAST(rev_c AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue",
            f"CASE WHEN prior_c > 0 THEN {yoy} END AS yoy_pct",
        )
        .orderBy("month")
    )


QUERIES["monthly_revenue_yoy"] = monthly_revenue_yoy


def _monthly_yoy_oracle() -> str:
    from ..functions.exact import halfup_signed_ratio_sql

    yoy = halfup_signed_ratio_sql(
        "100 * (rev_c - prior_c)", "prior_c", 2, "duck"
    )
    return f"""
        WITH monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                       AS month,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS rev_c
            FROM orders GROUP BY 1
        )
        SELECT m.month, m.n_orders,
               CAST(m.rev_c AS DOUBLE) / CAST(100 AS DOUBLE)
                   AS revenue,
               CASE WHEN p.rev_c > 0 THEN
                   {yoy.replace('rev_c', 'm.rev_c').replace('prior_c', 'p.rev_c')}
               END AS yoy_pct
        FROM monthly m
        LEFT JOIN monthly p ON p.month = m.month - INTERVAL 1 YEAR
        ORDER BY m.month
    """


ORACLES["monthly_revenue_yoy"] = _monthly_yoy_oracle()
