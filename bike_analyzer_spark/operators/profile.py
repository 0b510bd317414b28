"""Table profiling — the data-audit primitive a training-data
pipeline runs before ingesting a new source: per-column null rates,
distinct counts, and numeric ranges, computed in ONE pass (a single
aggregate projection; no per-column scans, no shuffles beyond the
final 1-row aggregate).

Output is long-form (one row per column) so the profile of a
1000-column table is still a readable relation, and schema-stable
regardless of profiled-table width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.exact import halfup_ratio_sql
from ..sources.catalog import load

_NUMERIC = (
    T.IntegerType,
    T.LongType,
    T.DoubleType,
    T.FloatType,
    T.ShortType,
    T.ByteType,
)


def profile(df: DataFrame) -> DataFrame:
    """One-pass long-form profile of every column of df."""
    aggs = []
    for f in df.schema.fields:
        c = f.name
        aggs.append(F.count(F.lit(1)).alias(f"{c}__rows"))
        aggs.append(F.count(F.col(c)).alias(f"{c}__nonnull"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__distinct"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.round(F.min(c), 4).cast("double").alias(f"{c}__min"))
            aggs.append(F.round(F.max(c), 4).cast("double").alias(f"{c}__max"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max"))
    wide = df.agg(*aggs)
    stack_args = []
    for f in df.schema.fields:
        c = f.name
        stack_args.append(f"'{c}'")
        stack_args.extend(
            [f"`{c}__rows`", f"`{c}__nonnull`", f"`{c}__distinct`",
             f"`{c}__min`", f"`{c}__max`"]
        )
    n = len(df.schema.fields)
    stacked = wide.select(
        F.expr(
            f"stack({n}, {', '.join(stack_args)}) AS "
            "(col_name, n_rows, n_nonnull, n_distinct, min_value, max_value)"
        )
    )
    # integer half-up ratio (functions.exact): a rounded double
    # null-rate flips one ulp cross-engine when n_rows is 2^a*5^b
    return stacked.withColumn(
        "null_rate",
        F.expr(
            halfup_ratio_sql("n_rows - n_nonnull", "n_rows")
        ),
    ).orderBy("col_name")


def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timestamp profiled as epoch micros (cross-engine-stable numeric)
    ev = (
        load(spark, sf_dir, "events")
        .withColumn("ts_us", F.unix_micros("ts"))
        .drop("ts")
    )
    return profile(ev)


QUERIES = {
    "profile_events": profile_events,
}


def _col_profile_duck(c: str, numeric: bool) -> str:
    mn = f"round(CAST(min({c}) AS DOUBLE), 4)" if numeric else "CAST(NULL AS DOUBLE)"
    mx = f"round(CAST(max({c}) AS DOUBLE), 4)" if numeric else "CAST(NULL AS DOUBLE)"
    ratio = halfup_ratio_sql(
        f"count(*) - count({c})", "count(*)", engine="duck"
    )
    return f"""
        SELECT '{c}' AS col_name,
               count(*) AS n_rows,
               count({c}) AS n_nonnull,
               count(DISTINCT {c}) AS n_distinct,
               {mn} AS min_value,
               {mx} AS max_value,
               {ratio} AS null_rate
        FROM ev
    """


ORACLES = {
    "profile_events": (
        "WITH ev AS (SELECT event_id, user_id, event_type, value, props, "
        "epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)\n"
        + "\nUNION ALL\n".join(
            _col_profile_duck(c, num)
            for c, num in [
                ("event_id", True),
                ("user_id", True),
                ("event_type", False),
                ("value", True),
                ("props", False),
                ("ts_us", True),
            ]
        )
        + "\nORDER BY col_name"
    ),
}


#: declared relationships: (name, child table, child key, parent
#: table, parent key) — the dbt-style tests a warehouse runs nightly
FK_RELATIONSHIPS = (
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("orders.custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id",
     "customer", "c_custkey"),
)


def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: one row per declared relationship
    with child row count, NULL-key rows, distinct child keys, orphan
    keys (no matching parent), and orphan ROWS.

    Scale shape: the child fact collapses to its KEY HISTOGRAM
    (groupBy key, count) BEFORE touching the parent — the anti join
    runs at key cardinality, never row cardinality, so auditing a
    100 TB lineitem against orders shuffles |distinct orderkeys|
    rows, and orphan-row counts come back as sums over that
    histogram. Each relationship is an independent branch of one
    union — Spark schedules them as parallel stages.

    Reference analog: none (the reference never validates
    referential integrity) — the read-side complement of
    `sources/constraints.py`'s write-side foreign_key gate.
    """
    out = None
    for name, child, ckey, parent, pkey in FK_RELATIONSHIPS:
        c = load(spark, sf_dir, child).select(F.col(ckey).alias("k"))
        p = (
            load(spark, sf_dir, parent)
            .select(F.col(pkey).alias("k"))
            .distinct()
        )
        hist = c.where(F.col("k").isNotNull()).groupBy("k").agg(
            F.count(F.lit(1)).alias("n")
        )
        nulls = c.where(F.col("k").isNull()).agg(
            F.count(F.lit(1)).alias("n_null_keys")
        )
        orphans = (
            hist.join(p, "k", "left_anti")
            .agg(
                F.count(F.lit(1)).alias("n_orphan_keys"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("n_orphan_rows"),
            )
        )
        totals = hist.agg(
            F.sum("n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct_keys"),
        )
        row = (
            totals.crossJoin(F.broadcast(nulls))
            .crossJoin(F.broadcast(orphans))
            .selectExpr(
                f"'{name}' AS relationship",
                "n_rows",
                "n_null_keys",
                "n_distinct_keys",
                "n_orphan_keys",
                "n_orphan_rows",
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("relationship")


QUERIES["integrity_audit"] = integrity_audit


def _integrity_oracle() -> str:
    parts = []
    for name, child, ckey, parent, pkey in FK_RELATIONSHIPS:
        parts.append(f"""
        SELECT '{name}' AS relationship,
               CAST(sum(n) AS BIGINT) AS n_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM {child}
                WHERE {ckey} IS NULL) AS n_null_keys,
               count(*) AS n_distinct_keys,
               CAST(coalesce(sum(CASE WHEN orphan THEN 1 END), 0)
                    AS BIGINT) AS n_orphan_keys,
               CAST(coalesce(sum(CASE WHEN orphan THEN n END), 0)
                    AS BIGINT) AS n_orphan_rows
        FROM (
            SELECT k, n,
                   k NOT IN (SELECT {pkey} FROM {parent}
                             WHERE {pkey} IS NOT NULL) AS orphan
            FROM (
                SELECT {ckey} AS k, CAST(count(*) AS BIGINT) AS n
                FROM {child} WHERE {ckey} IS NOT NULL GROUP BY 1
            )
        )""")
    body = "\n        UNION ALL\n".join(parts)
    return f"{body}\n        ORDER BY relationship"


ORACLES["integrity_audit"] = _integrity_oracle()


#: shuffle keys audited for skew: (display name, table, key column)
SKEW_KEYS = (
    ("events.user_id", "events", "user_id"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("documents.source", "documents", "source"),
)


def skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics — the report a 100-TB operator
    reads BEFORE a join melts an executor: per declared key, the
    rows-per-key distribution's exact median and p99, the heaviest
    key's row count, its share of the table, and the skew ratio
    (max over mean). AQE's skew-join split and `scale.salted_*`
    are the remedies; this query is the instrument that says when
    they're needed.

    Exactness: everything derives from the (rows-per-key -> n_keys)
    HISTOGRAM-OF-THE-HISTOGRAM — integer order statistics via the
    doubled-median and the pure-integer ceil rank
    ((99K + 99) div 100), shares/ratios via half-up wide division.

    Scale shape: one shuffle per table to its key histogram; the
    distribution-of-counts frame is tiny (distinct frequencies), so
    the window/rank passes cost nothing. Branches union — Spark
    runs them as independent parallel stages.
    """
    from pyspark.sql import Window

    from ..functions.exact import halfup_ratio_wide_sql

    out = None
    for name, table, key in SKEW_KEYS:
        hist = (
            load(spark, sf_dir, table)
            .where(F.col(key).isNotNull())
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        dist = hist.groupBy("n").agg(
            F.count(F.lit(1)).alias("nk")
        )
        w = Window.orderBy("n")
        c = dist.withColumn(
            "cum", F.sum("nk").over(w)
        ).withColumn(
            "kk", F.sum("nk").over(Window.partitionBy(F.lit(1)))
        )
        row = (
            c.agg(
                F.expr("sum(n * nk)").alias("n_rows"),
                F.max("kk").alias("n_keys"),
                F.max("n").alias("max_key_rows"),
                (
                    F.min(
                        F.when(
                            F.expr("cum >= (kk + 1) div 2"), F.col("n")
                        )
                    )
                    + F.min(
                        F.when(
                            F.expr("cum >= kk div 2 + 1"), F.col("n")
                        )
                    )
                ).alias("med2"),
                F.min(
                    F.when(
                        F.expr("cum >= (99 * kk + 99) div 100"),
                        F.col("n"),
                    )
                ).alias("p99_rows"),
            )
            .selectExpr(
                f"'{name}' AS shuffle_key",
                "n_rows",
                "n_keys",
                "max_key_rows",
                "CAST(med2 AS DOUBLE) / CAST(2 AS DOUBLE)"
                " AS p50_rows",
                "p99_rows",
                f"{halfup_ratio_wide_sql('max_key_rows * n_keys', 'n_rows', 4)}"
                " AS skew_ratio",
                f"{halfup_ratio_wide_sql('100 * max_key_rows', 'n_rows', 4)}"
                " AS top_share_pct",
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("shuffle_key")


QUERIES["skew_report"] = skew_report


def _skew_oracle() -> str:
    from ..functions.exact import halfup_ratio_wide_sql

    parts = []
    for name, table, key in SKEW_KEYS:
        parts.append(f"""
        SELECT '{name}' AS shuffle_key, n_rows, n_keys, max_key_rows,
               CAST(med2 AS DOUBLE) / CAST(2 AS DOUBLE) AS p50_rows,
               p99_rows,
               {halfup_ratio_wide_sql(
                   'max_key_rows * n_keys', 'n_rows', 4, 'duck')}
                   AS skew_ratio,
               {halfup_ratio_wide_sql(
                   '100 * max_key_rows', 'n_rows', 4, 'duck')}
                   AS top_share_pct
        FROM (
            SELECT CAST(sum(n * nk) AS BIGINT) AS n_rows,
                   max(kk) AS n_keys,
                   max(n) AS max_key_rows,
                   min(CASE WHEN cum >= (kk + 1) // 2 THEN n END)
                   + min(CASE WHEN cum >= kk // 2 + 1 THEN n END)
                       AS med2,
                   min(CASE WHEN cum >= (99 * kk + 99) // 100
                            THEN n END) AS p99_rows
            FROM (
                SELECT n, nk,
                       CAST(sum(nk) OVER (ORDER BY n) AS BIGINT)
                           AS cum,
                       CAST(sum(nk) OVER () AS BIGINT) AS kk
                FROM (
                    SELECT n, CAST(count(*) AS BIGINT) AS nk
                    FROM (
                        SELECT {key} AS k,
                               CAST(count(*) AS BIGINT) AS n
                        FROM {table} WHERE {key} IS NOT NULL
                        GROUP BY 1
                    ) GROUP BY n
                )
            )
        )""")
    body = "\n        UNION ALL\n".join(parts)
    return f"{body}\n        ORDER BY shuffle_key"


ORACLES["skew_report"] = _skew_oracle()


#: allowed delivery delay before an event counts LATE — mirrors the
#: 30-minute watermark the streaming surfaces configure
#: (streaming/lateaudit.py LATE_DELAY_US)
DISORDER_DELAY_US = 30 * 60 * 1_000_000


def event_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch out-of-orderness audit over the events table — the
    BATCH twin of the streaming delivery-lag audit
    (streaming/lateaudit.py): per event type, how many events arrive
    (event_id = ingest sequence) with an event time OLDER than
    something already seen on the same user's stream, how many exceed
    the 30-minute watermark the streaming surfaces configure (i.e.
    would be DROPPED by the watermarked operators), and the worst
    backward jump. This is the query that answers "is a 30-minute
    watermark actually generous enough for this source?" BEFORE the
    stream silently discards data.

    Scale shape: one scan, one per-user window (uniform key, ordered
    by the arrival sequence, running max of event time), one bounded
    aggregate by event type. Exact integer microseconds end to end —
    no doubles anywhere.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lagged = ev.withColumn("hwm", F.max("us").over(w))
    flags = lagged.select(
        "event_type",
        (F.col("us") < F.col("hwm")).cast("long").alias("ooo"),
        (F.col("us") < F.col("hwm") - F.lit(DISORDER_DELAY_US))
        .cast("long")
        .alias("late"),
        F.greatest(F.lit(0).cast("long"), F.col("hwm") - F.col("us")).alias(
            "lag_us"
        ),
    )
    return (
        flags.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.coalesce(F.sum("ooo"), F.lit(0).cast("long")).alias(
                "n_out_of_order"
            ),
            F.coalesce(F.sum("late"), F.lit(0).cast("long")).alias(
                "n_late_30m"
            ),
            F.max("lag_us").alias("max_lag_us"),
        )
        .orderBy("event_type")
    )


QUERIES["event_disorder_profile"] = event_disorder_profile

ORACLES["event_disorder_profile"] = f"""
    WITH e AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        FROM events
    ),
    l AS (
        SELECT event_type, us,
               max(us) OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS hwm
        FROM e
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN us < hwm THEN 1 ELSE 0 END) AS BIGINT)
               AS n_out_of_order,
           CAST(sum(CASE WHEN us < hwm - {DISORDER_DELAY_US}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_late_30m,
           CAST(max(greatest(CAST(0 AS BIGINT), hwm - us)) AS BIGINT)
               AS max_lag_us
    FROM l
    GROUP BY event_type
    ORDER BY event_type
"""
