"""Scale utilities — skew and cardinality tools for the 100-TB
regime (builder brief: "skewed keys -> salting or AQE skew-join";
SURVEY.md §7 step 9's approx-distinct extension).

- salted_sum_count: two-phase aggregation for skewed grouping keys.
  Phase 1 groups by (key, salt) so a hot key's rows spread over
  `n_salts` reducers; phase 2 combines the partials. Exact for
  algebraic aggregates (sum/count — and avg derived from them).
  AQE's skew-join handles JOIN skew automatically, but aggregation
  skew on a hot grouping key still concentrates on one reducer —
  salting is the standard fix, here as a reusable operator.
- approx_distinct: HyperLogLog++ `approx_count_distinct` with an
  error-bound contract vs exact (pytest-enforced). At 100 TB the
  exact distinct's full shuffle of every key is usually the wrong
  trade; HLL keeps it one pass + constant state.

Salt derivation is deterministic (hash of a caller-named unique
column, never rand()) so re-runs produce identical plans and results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key: str,
    value: str,
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-key sum+count via salted two-phase aggregation.

    Returns (key, sum_value, n). Equivalent to
    df.groupBy(key).agg(sum, count) — verified by tests — but the
    first shuffle key is (key, salt), bounding any reducer's share of
    a hot key to ~1/n_salts.
    """
    salt = F.pmod(F.hash(F.col(unique_col)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(F.col(key), F.col(value), salt)
        .groupBy(key, "_salt")
        .agg(
            F.sum(value).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").alias("sum_value"),
        F.sum("_pcnt").alias("n"),
    )


def approx_distinct(col: str, rsd: float = 0.02) -> Column:
    return F.approx_count_distinct(col, rsd=rsd)
