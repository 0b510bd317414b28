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
