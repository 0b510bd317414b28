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
- count-min sketch: the brief's "novel sketch" — sublinear frequency
  estimation. The sketch is D x W counters (D=4 rows of W=256
  buckets, 1 KB of state vs one counter per distinct key);
  estimate(k) = min over rows of the counter k hashes into, an upper
  bound on the true count (collisions only ADD). Unlike HLL, the CMS
  is exactly reproducible cross-engine: it is pure integer
  arithmetic over the portable md5 hash, so the DuckDB oracle builds
  the bit-identical sketch and the driver hash-matches it — a
  sketch with a full value-equality gate, not just an error bound.

Salt derivation is deterministic (hash of a caller-named unique
column, never rand()) so re-runs produce identical plans and results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import floordiv_duck, floordiv_sql
from ..functions.textfns import hash64, hash64_duck
from ..sources.catalog import load


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


CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_QUERY_KEYS = 20  # estimate user_ids < this bound


def _cms_bucket(d: int, key: Column) -> Column:
    """Row-d bucket of a key: portable hash64 salted with the row
    index, mod W. Same bytes on both engines."""
    return F.pmod(hash64(key.cast("string"), str(d)), F.lit(CMS_WIDTH))


def cms_sketch(df: DataFrame, key: str) -> DataFrame:
    """Build the D x W sketch over `df[key]`: explode each row into D
    (row, bucket) pairs (bounded fan-out), one groupBy on uniform
    hash-derived keys — skew-free regardless of key skew, which is
    the operational point: a hot key inflates ONE counter per row,
    not one reducer's whole input."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(d, F.col(key)).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_sketch_weighted(freq: DataFrame, key: str, weight: str) -> DataFrame:
    """D x W sketch from a KEY-LEVEL frequency table: counter
    cnt(d, b) = sum of `weight` over the keys row d hashes into
    bucket b — integer-identical to `cms_sketch` over the raw rows
    (cnt(d,b) = sum_{k: h_d(k)=b} freq(k), and a cell is non-empty
    iff some key hashes there iff some raw row does).

    The r12 optimization shape (guide §2.3, shuffle fewer bytes /
    pre-aggregate): when the caller ALREADY pays the per-key groupBy
    (cms_join_size's exact side must), fanning out D hashes per
    DISTINCT KEY instead of per raw row drops the explode + hash
    volume from D*N rows to D*|keys| — at 100 TB the difference
    between a corpus-sized pass and a key-cardinality one. Skew is
    unchanged: the per-key groupBy combines map-side, and the
    (d, bucket) groupBy stays hash-uniform."""
    pairs = freq.select(
        F.col(weight).alias("_w"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(d, F.col(key)).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket")
    ).agg(F.sum("_w").alias("cnt"))


def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS frequency estimates vs exact counts for a bounded key set:
    (user_id, exact_n, cms_est, overcount). cms_est >= exact_n always
    (pinned by test); the sketch side is 1 KB of state however many
    events exist."""
    events = load(spark, sf_dir, "events")
    sketch = cms_sketch(events, "user_id")
    exact = (
        events.filter(F.col("user_id") < CMS_QUERY_KEYS)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    probes = exact.select(
        "user_id",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(d, F.col("user_id")).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("user_id", "exact_n", F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "user_id",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy("user_id")
    )


QUERIES = {"cms_user_counts": cms_user_counts}

_CMS_PAIRS = f"""
        SELECT d.d AS d,
               {hash64_duck("CAST(user_id AS VARCHAR)",
                            "CAST(d.d AS VARCHAR)")} % {CMS_WIDTH} AS bucket,
               user_id
        FROM events, range({CMS_DEPTH}) d(d)
"""

ORACLES = {
    "cms_user_counts": f"""
        WITH pairs AS ({_CMS_PAIRS}),
        sketch AS (
            SELECT d, bucket, count(*) AS cnt
            FROM pairs GROUP BY d, bucket
        ),
        exact AS (
            SELECT user_id, count(*) AS exact_n
            FROM events WHERE user_id < {CMS_QUERY_KEYS}
            GROUP BY user_id
        ),
        est AS (
            SELECT e.user_id, e.exact_n, min(s.cnt) AS cms_est
            FROM exact e
            JOIN range({CMS_DEPTH}) d(d) ON true
            JOIN sketch s
              ON s.d = d.d
             AND s.bucket = {hash64_duck("CAST(e.user_id AS VARCHAR)",
                                         "CAST(d.d AS VARCHAR)")}
                 % {CMS_WIDTH}
            GROUP BY e.user_id, e.exact_n
        )
        SELECT user_id, exact_n, cms_est, cms_est - exact_n AS overcount
        FROM est
        ORDER BY user_id
    """,
}


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Skew-proof equi join: fact rows scatter across n_salts
    sub-partitions of their key; the (usually far smaller) `dim` side
    replicates once per salt via a bounded explode. Semantically an
    inner `facts.join(dim, key)` — verified by equivalence tests —
    but a hot key's rows spread over n_salts reducers instead of one.

    This is the MANUAL fallback for the skew regime AQE's skew-join
    split (on by default in `session.py`, pinned by
    tests/test_skew.py) already handles for sort-merge joins: AQE
    can't split a skewed BROADCAST-side or help a non-AQE engine, and
    at 100 TB a planner sometimes needs the deterministic form.

    `salt_source` picks the scatter column (a unique id keeps the
    spread even); default scatters on the fact row's whole-row hash.
    """
    src = (
        F.hash(F.col(salt_source))
        if salt_source is not None
        else F.hash(F.struct(*[F.col(c) for c in facts.columns]))
    )
    salted_facts = facts.withColumn(
        "_salt", F.pmod(src, F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_facts.join(salted_dim, [key, "_salt"]).drop("_salt")


def grid_quantiles(
    df: DataFrame,
    key: str,
    col: str,
    lo: float,
    hi: float,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    buckets: int = 1024,
) -> DataFrame:
    """Per-key approximate quantiles via a fixed-grid histogram — the
    100 TB path for grouped percentiles. An exact grouped percentile
    materializes every group's values in its reducer; this keeps
    per-key state at `buckets` integers no matter how many rows a
    key has. Guarantee: the returned edge is within ONE bucket width
    of the rank-based quantile (the ceil(q*n)-th smallest value) —
    pytest-pinned. Against the INTERPOLATED percentile() no value
    bound exists in general: interpolation can land between order
    statistics an arbitrary gap apart in a sparse tail.

    Deterministic by construction — bucket assignment is integer
    math and counts are integers, so results are identical under any
    partitioning (unlike sampling-based sketches). `lo`/`hi` come
    from table stats (one cheap min/max agg, or the skipping
    sidecar); values outside clamp to the edge buckets.

    Returns (key, q, value) long-form, one row per requested
    quantile; the quantile value is the covering bucket's upper edge
    (a conservative upper bound of the true quantile).
    """
    span = hi - lo
    b = (
        F.least(
            F.lit(buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(col) - lo) * buckets / span).cast("int"),
            ),
        )
    ).alias("_b")
    hist = (
        df.select(F.col(key), b)
        .groupBy(key, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy(key).orderBy("_b")
    cum = hist.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(Window.partitionBy(key))
    )
    out = None
    for q in qs:
        # Smallest bucket whose cumulative count covers ceil(q * n),
        # with q as an exact RATIONAL: float ceil(q*n) overshoots by
        # one whenever q*n lands just above an integer in binary
        # (q=0.07, n=100 -> 7.000000000000001 -> ceil 8), violating
        # the one-bucket-width guarantee for non-default qs (round-7
        # ADVICE). ceil(num/den) = (num + den - 1) div den in pure
        # integer math; the 10^6 denominator preserves 6 decimals of
        # q (covers q=0.99999-grade tails) while leaving bigint
        # headroom for ~9e12 rows per key.
        q_num = round(q * 1_000_000)
        rank = F.expr(f"(_n * {q_num} + {1_000_000 - 1}) div 1000000")
        hit = (
            cum.filter(F.col("_cum") >= rank)
            .groupBy(key)
            .agg(F.min("_b").alias("_b"))
            .select(
                F.col(key),
                F.lit(q).alias("q"),
                ((F.col("_b") + 1) * span / buckets + lo).alias("value"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out.orderBy(key, "q")


# ---- driver-facing promotions (round 8) --------------------------------
#
# salted_sum_count and grid_quantiles were pytest-only equivalence-
# tested through round 7 — the last meaningful capabilities with no
# driver oracle row. Both are deterministic integer math, so they get
# FULL value gates: the salted two-phase is exactly a GROUP BY, and
# the grid histogram's bucket/rank arithmetic is replayed step for
# step in the DuckDB twin.

#: fixed value-grid bounds for the events.value histogram: value is
#: generated in [0, ~560]; 1024 buckets over [0, 1024) make the bucket
#: width exactly 1.0, so bucket = floor(value) and every edge is an
#: exact small integer in BOTH engines (no binary-fraction drift).
GRID_LO, GRID_HI, GRID_BUCKETS = 0.0, 1024.0, 1024
GRID_QS = (0.5, 0.9, 0.99)


def salted_event_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value totals THROUGH the salted two-phase
    aggregate: phase 1 groups on (event_type, salt16) so a hot type's
    rows fan over 16 reducers, phase 2 folds the 16 partials — the
    manual fix for aggregation skew AQE can't touch (it only splits
    join partitions). Values sum as exact integer milli-units, so the
    rewrite is value-identical to the plain GROUP BY the oracle runs,
    under any partitioning."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 1000, 0).cast("long").alias("v_m"),
    )
    out = salted_sum_count(
        ev, key="event_type", value="v_m", unique_col="event_id"
    )
    return out.select(
        "event_type",
        F.col("sum_value").alias("sum_value_milli"),
        "n",
    ).orderBy("event_type")


def grid_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p90/p99 of `value` via the fixed-grid
    histogram — the 100-TB grouped-percentile path (per-key state =
    1024 counters, never the group's row set). lo/hi are FIXED module
    constants (value ∈ [0, ~560]), so bucket assignment is
    floor(value) exactly; the rank is the exact-rational ceil both
    engines compute in integers. Output: (event_type, q, value)."""
    ev = load(spark, sf_dir, "events")
    return grid_quantiles(
        ev,
        key="event_type",
        col="value",
        lo=GRID_LO,
        hi=GRID_HI,
        qs=GRID_QS,
        buckets=GRID_BUCKETS,
    )


QUERIES["scale_salted_sums"] = salted_event_sums
QUERIES["scale_grid_quantiles"] = grid_value_quantiles

ORACLES["scale_salted_sums"] = """
    SELECT event_type,
           CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
               AS sum_value_milli,
           count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""

_GRID_RANKS = ", ".join(
    f"(CAST({q} AS DOUBLE), {round(q * 1_000_000)})" for q in GRID_QS
)

# bare decimal literals parse as DECIMAL in DuckDB — CAST to DOUBLE so
# the bucket/edge arithmetic runs the same IEEE ops as the Spark twin
_LO = f"CAST({GRID_LO} AS DOUBLE)"
_SPAN = f"(CAST({GRID_HI} AS DOUBLE) - CAST({GRID_LO} AS DOUBLE))"

ORACLES["scale_grid_quantiles"] = f"""
    WITH h AS (
        SELECT event_type,
               LEAST({GRID_BUCKETS - 1}, GREATEST(0,
                   CAST(floor((value - {_LO}) * {GRID_BUCKETS}
                              / {_SPAN}) AS INT)))
                   AS b,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, b,
               sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cm,
               sum(c) OVER (PARTITION BY event_type) AS n
        FROM h
    ),
    qs(q, qn) AS (VALUES {_GRID_RANKS}),
    hit AS (
        SELECT event_type, q, min(b) AS b
        FROM cum JOIN qs
          ON cm >= (n * qn + {1_000_000 - 1}) // 1000000
        GROUP BY event_type, q
    )
    SELECT event_type, q,
           (b + 1) * {_SPAN} / {GRID_BUCKETS} + {_LO} AS value
    FROM hit
    ORDER BY event_type, q
"""


# ------------------------------------------------------ HyperLogLog

#: HLL geometry: m = 2^HLL_P registers; the hash is the portable
#: 32-bit `hash64` (md5 head), split top-P bits -> register, low
#: (32-P) bits -> rank
HLL_P = 8
HLL_M = 1 << HLL_P
HLL_LOW_BITS = 32 - HLL_P
HLL_SALT = "hll"

#: shared-text rank-of-lowest-set-bit over the low bits: v & -v
#: isolates it as an exact power of two, whose log2 is EXACT in IEEE
#: doubles, so the round() can never sit on a boundary; v = 0 (all
#: low bits zero) takes the saturated rank
_RHO = (
    f"CASE WHEN lo = 0 THEN {HLL_LOW_BITS + 1}"
    " ELSE CAST(round(log2(CAST((lo & -lo) AS DOUBLE))) AS INT) + 1"
    " END"
)

#: the standard bias constant alpha_m for m >= 128, as shared text
_ALPHA = "(0.7213 / (1.0 + 1.079 / CAST(m AS DOUBLE)))"

#: raw estimate alpha*m^2 / sum(2^-M_j), with the register sum held
#: EXACT: 2^-M_j = 2^(LOW+1-M_j) / 2^(LOW+1), an integer per
#: register, so the only double aggregation risk (order-dependent
#: float sums) is gone; small-range correction = linear counting
#: when E <= 2.5m and empty registers remain
_EST = (
    f"CASE WHEN {_ALPHA} * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)"
    f" * CAST({1 << (HLL_LOW_BITS + 1)} AS DOUBLE)"
    f" / CAST(s AS DOUBLE) <= 2.5 * CAST(m AS DOUBLE)"
    " AND v > 0"
    " THEN CAST(m AS DOUBLE)"
    " * ln(CAST(m AS DOUBLE) / CAST(v AS DOUBLE))"
    f" ELSE {_ALPHA} * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)"
    f" * CAST({1 << (HLL_LOW_BITS + 1)} AS DOUBLE)"
    f" / CAST(s AS DOUBLE) END"
)


def hll_user_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate vs the exact count, one
    row: registers m, filled registers, the estimate, and the
    signed error in ppm — the bounded-state sketch that replaces
    COUNT(DISTINCT) when the distinct set itself no longer fits
    (the CMS's cardinality sibling; at 100 TB the 256-register
    state is what a streaming aggregator would carry).

    Exactness discipline: the register table is exact integers
    (max-rank per register, 2^(LOW+1-rank) summands), so the only
    doubles are ONE shared-text estimate expression over (m, s, v)
    and the ln() of the linear-counting branch — bit-equal in both
    engines. The exact distinct count rides the same query for the
    error column; err_ppm's round() sits on the accepted
    quantization boundary class (dsir/lm).

    Scale shape: one map-side-combinable groupBy on the register id
    (<= m groups) after a projection; the exact count is the usual
    two-phase distinct; both collapse to a 1-row report.
    """
    ev = load(spark, sf_dir, "events").select(
        hash64(F.col("user_id").cast("string"), HLL_SALT).alias("h")
    )
    regs = (
        ev.select(
            F.expr(f"h div {1 << HLL_LOW_BITS}").alias("reg"),
            F.expr(f"h % {1 << HLL_LOW_BITS}").alias("lo"),
        )
        .selectExpr("reg", f"{_RHO} AS rho")
        .groupBy("reg")
        .agg(F.max("rho").alias("mr"))
    )
    sums = regs.agg(
        F.count(F.lit(1)).alias("filled"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_LOW_BITS + 1} - mr)")
        ).alias("s_filled"),
    )
    exact = load(spark, sf_dir, "events").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return (
        sums.crossJoin(F.broadcast(exact))
        .selectExpr(
            f"CAST({HLL_M} AS BIGINT) AS m",
            "filled",
            "n_exact",
            # empty registers contribute 2^-0 = 1 each: 2^(LOW+1)
            f"s_filled + (CAST({HLL_M} AS BIGINT) - filled)"
            f" * {1 << (HLL_LOW_BITS + 1)} AS s",
            f"CAST({HLL_M} AS BIGINT) - filled AS v",
        )
        .selectExpr(
            "m",
            "filled",
            "n_exact",
            f"{_EST} AS hll_estimate",
            f"CAST(round(({_EST} - CAST(n_exact AS DOUBLE))"
            " / CAST(n_exact AS DOUBLE) * 1000000) AS BIGINT)"
            " AS err_ppm",
        )
    )


QUERIES["hll_user_estimate"] = hll_user_estimate

_H_DUCK = hash64_duck("CAST(user_id AS VARCHAR)", repr(HLL_SALT))

ORACLES["hll_user_estimate"] = f"""
    WITH h AS (
        SELECT {_H_DUCK} AS h FROM events
    ),
    rl AS (
        SELECT h // {1 << HLL_LOW_BITS} AS reg,
               h % {1 << HLL_LOW_BITS} AS lo
        FROM h
    ),
    regs AS (
        SELECT reg, max({_RHO}) AS mr FROM rl GROUP BY reg
    ),
    sums AS (
        SELECT count(*) AS filled,
               CAST(sum(CAST(1 AS BIGINT)
                        << ({HLL_LOW_BITS + 1} - mr)) AS BIGINT)
                   AS s_filled
        FROM regs
    ),
    exact AS (
        SELECT count(DISTINCT user_id) AS n_exact FROM events
    ),
    wide AS (
        SELECT CAST({HLL_M} AS BIGINT) AS m, filled, n_exact,
               s_filled + (CAST({HLL_M} AS BIGINT) - filled)
                   * {1 << (HLL_LOW_BITS + 1)} AS s,
               CAST({HLL_M} AS BIGINT) - filled AS v
        FROM sums CROSS JOIN exact
    )
    SELECT m, filled, n_exact,
           {_EST} AS hll_estimate,
           CAST(round(({_EST} - CAST(n_exact AS DOUBLE))
               / CAST(n_exact AS DOUBLE) * 1000000) AS BIGINT)
               AS err_ppm
    FROM wide
"""


def hll_grouped_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED HyperLogLog: distinct users PER EVENT TYPE from one
    pass — the shape a 100 TB dashboard actually needs (per-segment
    reach), proving the sketch composes under GROUP BY: register
    state is (group x m) rows, the merge is the same max, and the
    estimate expression is evaluated once per group. The exact
    per-group distinct count rides alongside with the signed ppm
    error, so the driver gate checks the whole sketch path per
    group (same register/rank/summand machinery as
    `hll_user_estimate` — one definition, two granularities)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        hash64(F.col("user_id").cast("string"), HLL_SALT).alias("h"),
    )
    regs = (
        ev.select(
            "event_type",
            F.expr(f"h div {1 << HLL_LOW_BITS}").alias("reg"),
            F.expr(f"h % {1 << HLL_LOW_BITS}").alias("lo"),
        )
        .selectExpr("event_type", "reg", f"{_RHO} AS rho")
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("mr"))
    )
    sums = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("filled"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_LOW_BITS + 1} - mr)")
        ).alias("s_filled"),
    )
    exact = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_exact"))
    )
    return (
        sums.join(exact, "event_type")
        .selectExpr(
            "event_type",
            f"CAST({HLL_M} AS BIGINT) AS m",
            "filled",
            "n_exact",
            f"s_filled + (CAST({HLL_M} AS BIGINT) - filled)"
            f" * {1 << (HLL_LOW_BITS + 1)} AS s",
            f"CAST({HLL_M} AS BIGINT) - filled AS v",
        )
        .selectExpr(
            "event_type",
            "m",
            "filled",
            "n_exact",
            f"{_EST} AS hll_estimate",
            f"CAST(round(({_EST} - CAST(n_exact AS DOUBLE))"
            " / CAST(n_exact AS DOUBLE) * 1000000) AS BIGINT)"
            " AS err_ppm",
        )
        .orderBy("event_type")
    )


QUERIES["hll_grouped_estimate"] = hll_grouped_estimate

ORACLES["hll_grouped_estimate"] = f"""
    WITH h AS (
        SELECT event_type, {_H_DUCK} AS h FROM events
    ),
    rl AS (
        SELECT event_type, h // {1 << HLL_LOW_BITS} AS reg,
               h % {1 << HLL_LOW_BITS} AS lo
        FROM h
    ),
    regs AS (
        SELECT event_type, reg, max({_RHO}) AS mr
        FROM rl GROUP BY 1, 2
    ),
    sums AS (
        SELECT event_type, count(*) AS filled,
               CAST(sum(CAST(1 AS BIGINT)
                        << ({HLL_LOW_BITS + 1} - mr)) AS BIGINT)
                   AS s_filled
        FROM regs GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, count(DISTINCT user_id) AS n_exact
        FROM events GROUP BY event_type
    ),
    wide AS (
        SELECT sums.event_type, CAST({HLL_M} AS BIGINT) AS m,
               filled, n_exact,
               s_filled + (CAST({HLL_M} AS BIGINT) - filled)
                   * {1 << (HLL_LOW_BITS + 1)} AS s,
               CAST({HLL_M} AS BIGINT) - filled AS v
        FROM sums JOIN exact USING (event_type)
    )
    SELECT event_type, m, filled, n_exact,
           {_EST} AS hll_estimate,
           CAST(round(({_EST} - CAST(n_exact AS DOUBLE))
               / CAST(n_exact AS DOUBLE) * 1000000) AS BIGINT)
               AS err_ppm
    FROM wide
    ORDER BY event_type
"""


#: trailing-window width (days) for the sliding reach
SLIDE_DAYS = 7
_DAY_US = 86_400_000_000

#: floor-division day bucket for the DuckDB oracles (twin of the
#: Spark side's floordiv_sql; see functions/exact.py)
_DAY_FLOOR = floordiv_duck("epoch_us(ts)", _DAY_US)


def hll_sliding_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-WINDOW HyperLogLog: each day's trailing-7-day
    distinct-user reach, computed entirely from DAY-GRAIN register
    state — the time-dimension mergeability story that makes HLL a
    production rollup primitive: a streaming aggregator lands one
    (day × m) register table as it goes, and ANY trailing window is
    a per-register max over the relevant days. Raw events are never
    rescanned per window; a naive COUNT(DISTINCT) would re-touch 7
    days of raw data for every report day, and its distinct set
    doesn't fit at 100 TB.

    Exactness discipline: day registers and the window merge are
    exact integer max/sum (same _RHO/_EST machinery as
    `hll_user_estimate`); the per-day estimate is the one
    shared-text double expression. The exact trailing distinct count
    rides alongside (from the distinct (day,user) frame, never raw
    rows) with the signed ppm error — the audit column the gate
    checks, and the first thing a real deployment would drop.

    Scale shape: one scan -> (day × reg) max-agg (days × m rows —
    calendar-bounded metadata); the trailing merge is a ≤ |days|-row
    broadcast lattice range-joined against that register table
    (fan-out ≤ days × m × 7 — still metadata); the exact twin
    range-joins the distinct (day,user) frame (≤ 7× its size), one
    groupBy each.
    """
    ev = load(spark, sf_dir, "events").select(
        F.expr(floordiv_sql("unix_micros(ts)", _DAY_US)).alias("day"),
        hash64(F.col("user_id").cast("string"), HLL_SALT).alias("h"),
    )
    regs_day = (
        ev.select(
            "day",
            F.expr(f"h div {1 << HLL_LOW_BITS}").alias("reg"),
            F.expr(f"h % {1 << HLL_LOW_BITS}").alias("lo"),
        )
        .selectExpr("day", "reg", f"{_RHO} AS rho")
        .groupBy("day", "reg")
        .agg(F.max("rho").alias("mr"))
        # two consumers: the day lattice and the window merge
        .localCheckpoint(eager=False)
    )
    lattice = regs_day.select("day").distinct()
    merged = (
        regs_day.alias("r")
        .join(
            F.broadcast(lattice.alias("d")),
            F.expr(f"r.day BETWEEN d.day - {SLIDE_DAYS - 1} AND d.day"),
        )
        .groupBy(F.col("d.day").alias("day"), "reg")
        .agg(F.max("mr").alias("mr"))
    )
    sums = merged.groupBy("day").agg(
        F.count(F.lit(1)).alias("filled"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_LOW_BITS + 1} - mr)")
        ).alias("s_filled"),
    )
    du = (
        load(spark, sf_dir, "events")
        .select(
            F.expr(floordiv_sql("unix_micros(ts)", _DAY_US)).alias("day"),
            "user_id",
        )
        .distinct()
    )
    exact = (
        du.alias("u")
        .join(
            F.broadcast(lattice.alias("d")),
            F.expr(f"u.day BETWEEN d.day - {SLIDE_DAYS - 1} AND d.day"),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("user_id").alias("n_exact"))
    )
    return (
        sums.join(exact, "day")
        .selectExpr(
            "day",
            f"CAST({HLL_M} AS BIGINT) AS m",
            "filled",
            "n_exact",
            f"s_filled + (CAST({HLL_M} AS BIGINT) - filled)"
            f" * {1 << (HLL_LOW_BITS + 1)} AS s",
            f"CAST({HLL_M} AS BIGINT) - filled AS v",
        )
        .selectExpr(
            "day",
            "m",
            "filled",
            "n_exact",
            f"{_EST} AS hll_estimate",
            f"CAST(round(({_EST} - CAST(n_exact AS DOUBLE))"
            " / CAST(n_exact AS DOUBLE) * 1000000) AS BIGINT)"
            " AS err_ppm",
        )
        .orderBy("day")
    )


QUERIES["hll_sliding_reach"] = hll_sliding_reach

ORACLES["hll_sliding_reach"] = f"""
    WITH h AS (
        SELECT {_DAY_FLOOR} AS day, {_H_DUCK} AS h
        FROM events
    ),
    rl AS (
        SELECT day, h // {1 << HLL_LOW_BITS} AS reg,
               h % {1 << HLL_LOW_BITS} AS lo
        FROM h
    ),
    regs AS (
        SELECT day, reg, max({_RHO}) AS mr FROM rl GROUP BY 1, 2
    ),
    lat AS (SELECT DISTINCT day FROM regs),
    merged AS (
        SELECT d.day AS day, r.reg, max(r.mr) AS mr
        FROM regs r JOIN lat d
          ON r.day BETWEEN d.day - {SLIDE_DAYS - 1} AND d.day
        GROUP BY 1, 2
    ),
    sums AS (
        SELECT day, count(*) AS filled,
               CAST(sum(CAST(1 AS BIGINT)
                        << ({HLL_LOW_BITS + 1} - mr)) AS BIGINT)
                   AS s_filled
        FROM merged GROUP BY day
    ),
    du AS (
        SELECT DISTINCT {_DAY_FLOOR} AS day, user_id
        FROM events
    ),
    exact AS (
        SELECT d.day AS day, count(DISTINCT u.user_id) AS n_exact
        FROM du u JOIN lat d
          ON u.day BETWEEN d.day - {SLIDE_DAYS - 1} AND d.day
        GROUP BY 1
    ),
    wide AS (
        SELECT sums.day, CAST({HLL_M} AS BIGINT) AS m, filled, n_exact,
               s_filled + (CAST({HLL_M} AS BIGINT) - filled)
                   * {1 << (HLL_LOW_BITS + 1)} AS s,
               CAST({HLL_M} AS BIGINT) - filled AS v
        FROM sums JOIN exact USING (day)
    )
    SELECT day, m, filled, n_exact,
           {_EST} AS hll_estimate,
           CAST(round(({_EST} - CAST(n_exact AS DOUBLE))
               / CAST(n_exact AS DOUBLE) * 1000000) AS BIGINT)
               AS err_ppm
    FROM wide
    ORDER BY day
"""


#: the two audiences whose reach overlap the sketch estimates
OVERLAP_A, OVERLAP_B = "view", "purchase"


def hll_overlap_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIENCE-OVERLAP estimate by HLL inclusion-exclusion — the
    set-operation story sketches exist for: |A∩B| ≈ est(A) + est(B)
    − est(A∪B), where est(A∪B) comes from MERGING the two register
    tables (per-register max) without touching the raw data again.
    This is the computation behind "how many viewers also purchased"
    on a 100 TB event log where neither audience's distinct set fits
    anywhere — three sketch-sized states answer it.

    Exactness discipline: registers and merges are exact integers
    (same _RHO/_EST machinery as hll_user_estimate); the three
    estimates and the final inclusion-exclusion arithmetic are the
    same shared-text double expressions in both engines, so the
    driver hash stays bit-equal. The exact overlap (count of users
    in BOTH audiences) rides alongside with a signed ppm error.

    Scale shape: one scan -> (audience, register) max-agg (≤ 2m
    rows) -> register merge (≤ m rows) -> three 1-row aggregates;
    the exact twin is one user-keyed aggregate.
    """
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin(OVERLAP_A, OVERLAP_B)
    )
    hashed = ev.select(
        F.col("event_type").alias("aud"),
        hash64(F.col("user_id").cast("string"), HLL_SALT).alias("h"),
    )
    regs = (
        hashed.select(
            "aud",
            F.expr(f"h div {1 << HLL_LOW_BITS}").alias("reg"),
            F.expr(f"h % {1 << HLL_LOW_BITS}").alias("lo"),
        )
        .selectExpr("aud", "reg", f"{_RHO} AS rho")
        .groupBy("aud", "reg")
        .agg(F.max("rho").alias("mr"))
    )
    union_regs = (
        regs.groupBy("reg")
        .agg(F.max("mr").alias("mr"))
        .select(F.lit("union").alias("aud"), "reg", "mr")
    )
    all3 = regs.select("aud", "reg", "mr").unionByName(union_regs)
    sums = all3.groupBy("aud").agg(
        F.count(F.lit(1)).alias("filled"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_LOW_BITS + 1} - mr)")
        ).alias("s_filled"),
    )
    est = sums.selectExpr(
        "aud",
        f"CAST({HLL_M} AS BIGINT) AS m",
        "filled",
        f"s_filled + (CAST({HLL_M} AS BIGINT) - filled)"
        f" * {1 << (HLL_LOW_BITS + 1)} AS s",
        f"CAST({HLL_M} AS BIGINT) - filled AS v",
    ).selectExpr("aud", f"{_EST} AS est")
    one = est.agg(
        F.max(F.when(F.col("aud") == OVERLAP_A, F.col("est"))).alias(
            "est_a"
        ),
        F.max(F.when(F.col("aud") == OVERLAP_B, F.col("est"))).alias(
            "est_b"
        ),
        F.max(F.when(F.col("aud") == "union", F.col("est"))).alias(
            "est_union"
        ),
    )
    exact = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == OVERLAP_A).cast("int")).alias(
                "in_a"
            ),
            F.max((F.col("event_type") == OVERLAP_B).cast("int")).alias(
                "in_b"
            ),
        )
        .agg(
            F.sum(
                ((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")
            ).alias("n_exact_overlap")
        )
    )
    return one.crossJoin(F.broadcast(exact)).selectExpr(
        "est_a",
        "est_b",
        "est_union",
        "est_a + est_b - est_union AS overlap_estimate",
        "n_exact_overlap",
        "CASE WHEN n_exact_overlap > 0 THEN"
        " CAST(round((est_a + est_b - est_union"
        " - CAST(n_exact_overlap AS DOUBLE))"
        " / CAST(n_exact_overlap AS DOUBLE) * 1000000) AS BIGINT)"
        " END AS err_ppm",
    )


QUERIES["hll_overlap_estimate"] = hll_overlap_estimate

ORACLES["hll_overlap_estimate"] = f"""
    WITH ev AS (
        SELECT event_type, user_id FROM events
        WHERE event_type IN ('{OVERLAP_A}', '{OVERLAP_B}')
    ),
    h AS (
        SELECT event_type AS aud, {_H_DUCK} AS h FROM ev
    ),
    rl AS (
        SELECT aud, h // {1 << HLL_LOW_BITS} AS reg,
               h % {1 << HLL_LOW_BITS} AS lo
        FROM h
    ),
    regs AS (
        SELECT aud, reg, max({_RHO}) AS mr FROM rl GROUP BY 1, 2
    ),
    all3 AS (
        SELECT aud, reg, mr FROM regs
        UNION ALL
        SELECT 'union' AS aud, reg, max(mr) AS mr
        FROM regs GROUP BY reg
    ),
    sums AS (
        SELECT aud, count(*) AS filled,
               CAST(sum(CAST(1 AS BIGINT)
                        << ({HLL_LOW_BITS + 1} - mr)) AS BIGINT)
                   AS s_filled
        FROM all3 GROUP BY aud
    ),
    wide AS (
        SELECT aud, CAST({HLL_M} AS BIGINT) AS m, filled,
               s_filled + (CAST({HLL_M} AS BIGINT) - filled)
                   * {1 << (HLL_LOW_BITS + 1)} AS s,
               CAST({HLL_M} AS BIGINT) - filled AS v
        FROM sums
    ),
    est AS (
        SELECT aud, {_EST} AS est FROM wide
    ),
    one AS (
        SELECT max(CASE WHEN aud = '{OVERLAP_A}' THEN est END) AS est_a,
               max(CASE WHEN aud = '{OVERLAP_B}' THEN est END) AS est_b,
               max(CASE WHEN aud = 'union' THEN est END) AS est_union
        FROM est
    ),
    flags AS (
        SELECT user_id,
               max(CASE WHEN event_type = '{OVERLAP_A}'
                   THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN event_type = '{OVERLAP_B}'
                   THEN 1 ELSE 0 END) AS in_b
        FROM ev GROUP BY user_id
    ),
    exact AS (
        SELECT CAST(sum(CASE WHEN in_a = 1 AND in_b = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_overlap
        FROM flags
    )
    SELECT est_a, est_b, est_union,
           est_a + est_b - est_union AS overlap_estimate,
           n_exact_overlap,
           CASE WHEN n_exact_overlap > 0 THEN
               CAST(round((est_a + est_b - est_union
                   - CAST(n_exact_overlap AS DOUBLE))
                   / CAST(n_exact_overlap AS DOUBLE) * 1000000)
                   AS BIGINT)
           END AS err_ppm
    FROM one CROSS JOIN exact
"""


def salted_event_nation_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-nation event rollup THROUGH the manual salted join
    (`salted_join`, the deterministic skew fallback documented for
    the regime AQE's runtime split can't reach): the events fact
    scatters across 16 salt sub-keys of its user dimension key, the
    customer dim replicates once per salt via a bounded explode, and
    the rollup folds the join output. Semantically identical to the
    plain equi join + GROUP BY the oracle runs — exact integer
    milli-unit sums make that equality bit-checkable. This registers
    the skew-proof JOIN rewrite as driver-graded evidence the same
    way scale_salted_sums registered the skew-proof AGGREGATE.

    Scale shape: one fact-side exchange on (key, salt) — same bytes
    as the plain join's exchange, spread 16x wider on hot keys; the
    dim side is |dim| x 16 rows, still broadcast-sized; the nation
    rollup is map-side combinable."""
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"),
        "event_id",
        F.round(F.col("value") * 1000, 0).cast("long").alias("v_m"),
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    joined = salted_join(
        ev, cust, "c_custkey", salt_source="event_id"
    )
    nat = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    return (
        joined.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("c_custkey").alias("n_users"),
            F.sum("v_m").alias("sum_value_milli"),
        )
        .join(F.broadcast(nat), "c_nationkey")
        .select(
            F.col("n_name").alias("nation"),
            "n_events",
            "n_users",
            "sum_value_milli",
        )
        .orderBy("nation")
    )


QUERIES["scale_salted_join"] = salted_event_nation_rollup

ORACLES["scale_salted_join"] = """
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(e.value * 1000) AS BIGINT))
                AS BIGINT) AS sum_value_milli
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    ORDER BY nation
"""


#: k-mins sketch geometry: m independent minima (stochastic
#: averaging), hash range R = 2^32 (the portable hash64's range)
KMINS_M = 16
KMINS_R = 1 << 32
KMINS_BSALT = "km-bucket"
KMINS_VSALT = "km-value"


def kmins_user_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate from a K-MINS sketch
    (bucketed minima of uniform hashes — the order-statistics
    cardinality family of Bar-Yossef et al. / Flajolet's MinCount,
    vs HLL's leading-zero family and CMS's counter family): state is
    m=16 minima per group; with ~n/m keys per bucket,
    E[min] = R/(n/m + 1), so n ≈ m * (m*R / sum(min) - 1).

    Like the CMS (and unlike HLL's double-typed estimate), the whole
    estimator is PURE INTEGER over the portable md5 hash — empty
    buckets coalesce to R, the estimate is
    m * ((m*R) div sum_min) - m — so the DuckDB oracle rebuilds the
    bit-identical sketch AND estimate: a full value-equality gate on
    an approximate operator. The exact distinct count rides alongside
    with the signed basis-point error for the accuracy audit
    (pytest-bounded at ~1/sqrt(m)).

    Scale shape: minima are algebraic — the groupBy(type, bucket)
    min() map-side-combines to m values per group per partition, and
    duplicate user_ids collapse for free (min is idempotent — the
    sketch needs NO distinct pass, unlike the exact side's
    count_distinct shuffle riding alongside only as the audit)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(
            hash64(F.col("user_id").cast("string"), KMINS_BSALT),
            F.lit(KMINS_M),
        ).alias("bucket"),
        hash64(F.col("user_id").cast("string"), KMINS_VSALT).alias("v"),
    )
    minima = ev.groupBy("event_type", "bucket").agg(
        F.min("v").alias("mv")
    )
    # bounded lattice: every (type, bucket) cell, empties -> R
    lattice = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(KMINS_M).select(
                    F.col("id").cast("bigint").alias("bucket")
                )
            )
        )
    )
    sums = (
        lattice.join(minima, ["event_type", "bucket"], "left")
        .groupBy("event_type")
        .agg(
            F.sum(F.coalesce(F.col("mv"), F.lit(KMINS_R))).alias("sum_min"),
            F.count(F.when(F.col("mv").isNotNull(), 1)).alias("filled"),
        )
    )
    exact = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_exact"))
    )
    est = (
        f"CAST({KMINS_M} AS BIGINT)"
        f" * ((CAST({KMINS_M} AS BIGINT) * {KMINS_R}) div sum_min)"
        f" - {KMINS_M}"
    )
    return (
        sums.join(exact, "event_type")
        .selectExpr(
            "event_type",
            "filled",
            "n_exact",
            f"{est} AS kmins_estimate",
            # signed error: sign * (|diff| div exact) — Spark's `div`
            # truncates toward zero while DuckDB's `//` floors, so
            # negative diffs must divide as magnitudes
            f"CAST(sign({est} - n_exact) AS BIGINT)"
            f" * ((abs({est} - n_exact) * 10000) div n_exact)"
            " AS err_bp",
        )
        .orderBy("event_type")
    )


QUERIES["kmins_user_estimate"] = kmins_user_estimate

_KM_EST = (
    f"CAST({KMINS_M} AS BIGINT)"
    f" * ((CAST({KMINS_M} AS BIGINT) * {KMINS_R}) // sum_min)"
    f" - {KMINS_M}"
)

ORACLES["kmins_user_estimate"] = f"""
    WITH ev AS (
        SELECT event_type,
               {hash64_duck("CAST(user_id AS VARCHAR)", f"'{KMINS_BSALT}'")}
                   % {KMINS_M} AS bucket,
               {hash64_duck("CAST(user_id AS VARCHAR)", f"'{KMINS_VSALT}'")}
                   AS v
        FROM events
    ),
    minima AS (
        SELECT event_type, bucket, min(v) AS mv
        FROM ev GROUP BY event_type, bucket
    ),
    lattice AS (
        SELECT event_type, b.range AS bucket
        FROM (SELECT DISTINCT event_type FROM events)
        CROSS JOIN range({KMINS_M}) b
    ),
    sums AS (
        SELECT event_type,
               CAST(sum(coalesce(mv, {KMINS_R})) AS BIGINT) AS sum_min,
               count(mv) AS filled
        FROM lattice LEFT JOIN minima USING (event_type, bucket)
        GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, count(DISTINCT user_id) AS n_exact
        FROM events GROUP BY event_type
    )
    SELECT event_type, filled, n_exact,
           {_KM_EST} AS kmins_estimate,
           CAST(sign({_KM_EST} - n_exact) AS BIGINT)
               * ((abs({_KM_EST} - n_exact) * 10000) // n_exact)
               AS err_bp
    FROM sums JOIN exact USING (event_type)
    ORDER BY event_type
"""


def cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven JOIN-SIZE estimation (the AGMS/Count-Min inner
    product, Alon-Gibbons-Matias-Szegedy + Cormode-Muthukrishnan):
    |A join B on k| = sum_k fA(k)*fB(k), estimated WITHOUT touching
    the join as min_d sum_b cntA(d,b)*cntB(d,b) over the two D x W
    sketches — always an OVERestimate (collisions only add), which
    is exactly the safe direction for a query planner sizing shuffle
    partitions or choosing a broadcast side.

    Two audited joins: the events self-join on user_id (the classic
    F2 / second frequency moment) and events x orders on user_id =
    o_custkey (fact-fact). Each row reports the sketch estimate, the
    exact size (key-level aggregates joined — never the join itself
    materialized), and the overestimate in basis points.

    Exactness: counters and products are exact integers end-to-end.

    Scale shape (r12, guide §2.3): the exact side REQUIRES a per-key
    frequency table for each input, so the sketches are built FROM
    those tables (`cms_sketch_weighted` — integer-identical counters,
    see its proof) instead of re-fanning out every raw row: each
    input is scanned once into one key-level groupBy (map-side
    combined, the only corpus-sized exchange), and everything
    downstream — D-way fan-out, 1 KB sketch state, the 1024-row
    inner-product joins, the key-sized exact join — is
    key-cardinality bounded. Nothing scales with the join's OUTPUT
    size — the whole point."""
    events = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")

    def inner_product(sa: DataFrame, sb: DataFrame) -> DataFrame:
        prod = (
            sa.join(
                sb.select(
                    "d", "bucket", F.col("cnt").alias("cnt_b")
                ),
                ["d", "bucket"],
            )
            .groupBy("d")
            .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("ip"))
        )
        return prod.agg(F.min("ip").alias("est"))

    def exact_size(fa: DataFrame, fb: DataFrame) -> DataFrame:
        return (
            fa.join(fb, "user_id")
            .agg(F.sum(F.col("fa") * F.col("fb")).alias("exact"))
        )

    # the frequency tables feed BOTH the exact side and the sketches
    ev_freq = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("fa"))
        .localCheckpoint(eager=False)  # 3 consumers
    )
    ord_freq = (
        orders.groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("fb"))
        .localCheckpoint(eager=False)  # 2 consumers
    )
    # ev_sketch is read three times (both sides of the self inner
    # product + the cross one) but NOT checkpointed: it derives from
    # the checkpointed ev_freq through one 1024-cell aggregate, so
    # recomputation is key-cardinality work while a checkpoint would
    # be another materialization barrier (measured: dropping it wins)
    ev_sketch = cms_sketch_weighted(ev_freq, "user_id", "fa")
    ord_sketch = cms_sketch_weighted(ord_freq, "user_id", "fb")
    self_est = inner_product(ev_sketch, ev_sketch.select(
        "d", "bucket", "cnt"
    ))
    self_exact = ev_freq.select(
        "user_id", "fa", F.col("fa").alias("fb")
    ).agg(F.sum(F.col("fa") * F.col("fb")).alias("exact"))
    cross_est = inner_product(ev_sketch, ord_sketch)
    cross_exact = exact_size(ev_freq, ord_freq)
    row_self = (
        self_est.crossJoin(F.broadcast(self_exact))
        .select(
            F.lit("events_self").alias("join_name"), "est", "exact"
        )
    )
    row_cross = (
        cross_est.crossJoin(F.broadcast(cross_exact))
        .select(
            F.lit("events_orders").alias("join_name"), "est", "exact"
        )
    )
    return (
        row_self.unionByName(row_cross)
        .select(
            "join_name",
            "est",
            "exact",
            F.expr("(10000 * est) div exact").alias("over_bp"),
        )
        .orderBy("join_name")
    )


QUERIES["cms_join_size"] = cms_join_size

_CMS_ORD_PAIRS = f"""
        SELECT d.d AS d,
               {hash64_duck("CAST(o_custkey AS VARCHAR)",
                            "CAST(d.d AS VARCHAR)")} % {CMS_WIDTH} AS bucket
        FROM orders, range({CMS_DEPTH}) d(d)
"""

ORACLES["cms_join_size"] = f"""
    WITH ev_pairs AS ({_CMS_PAIRS}),
    ev_sketch AS (
        SELECT d, bucket, count(*) AS cnt FROM ev_pairs GROUP BY d, bucket
    ),
    ord_pairs AS ({_CMS_ORD_PAIRS}),
    ord_sketch AS (
        SELECT d, bucket, count(*) AS cnt FROM ord_pairs GROUP BY d, bucket
    ),
    self_est AS (
        SELECT CAST(min(ip) AS BIGINT) AS est FROM (
            SELECT d, sum(a.cnt * b.cnt) AS ip
            FROM ev_sketch a JOIN ev_sketch b USING (d, bucket)
            GROUP BY d
        )
    ),
    cross_est AS (
        SELECT CAST(min(ip) AS BIGINT) AS est FROM (
            SELECT d, sum(a.cnt * b.cnt) AS ip
            FROM ev_sketch a JOIN ord_sketch b USING (d, bucket)
            GROUP BY d
        )
    ),
    ev_freq AS (
        SELECT user_id, count(*) AS fa FROM events GROUP BY user_id
    ),
    ord_freq AS (
        SELECT o_custkey AS user_id, count(*) AS fb
        FROM orders GROUP BY o_custkey
    ),
    self_exact AS (
        SELECT CAST(sum(fa * fa) AS BIGINT) AS exact FROM ev_freq
    ),
    cross_exact AS (
        SELECT CAST(sum(fa * fb) AS BIGINT) AS exact
        FROM ev_freq JOIN ord_freq USING (user_id)
    )
    SELECT join_name, est, exact, (10000 * est) // exact AS over_bp
    FROM (
        SELECT 'events_self' AS join_name, s.est, x.exact
        FROM self_est s, self_exact x
        UNION ALL
        SELECT 'events_orders', c.est, y.exact
        FROM cross_est c, cross_exact y
    )
    ORDER BY join_name
"""


BLOOM_M = 1 << 16  # bits (8 KB bitmap — broadcast-trivial)
BLOOM_K = 3  # hash functions
#: build-side predicate: finished urgent high-value orders — selective
#: enough that the probe side has real non-members to prune at every SF
BLOOM_BUILD_PRED = (
    "o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'"
    " AND o_totalprice > 150000"
)


def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter SEMI-JOIN pruning audit — the runtime-filter /
    dynamic-pushdown story measured end-to-end: build a K-hash,
    M-bit Bloom filter over the orders side's customer keys, probe
    every distinct events user, and report the pruning it buys
    against the EXACT semi join:

      (n_probe_keys, n_members, n_pass, false_pos, fpr_bp,
       rows_total, rows_pass, row_prune_bp)

    A probe key passes iff ALL K of its bit positions are set; a
    true member always passes (no false negatives — pinned by test),
    so the filter is safe to push below a shuffle: at 100 TB the
    ~KB bitmap broadcasts to every scan task and drops non-joining
    fact rows BEFORE the exchange, which is precisely Spark's
    runtime bloom-filter join optimization made auditable.

    Exactness: bit positions are the portable salted hash64 mod M;
    membership, counts, and basis points are exact integers.

    Scale shape: build side is one distinct+explode over the dim
    keys (K bounded positions per key, bitmap <= M rows); the probe
    is one distinct over fact keys + a broadcast join on positions
    counting hits; the exact side is one key-level semi join. No
    fact-fact shuffle anywhere."""
    events = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders").filter(F.expr(BLOOM_BUILD_PRED))

    def positions(key: Column) -> Column:
        return F.array(
            *[
                F.pmod(hash64(key.cast("string"), f"bloom{i}"), F.lit(BLOOM_M))
                for i in range(BLOOM_K)
            ]
        )

    bits = (
        orders.select(
            F.explode(positions(F.col("o_custkey"))).alias("pos")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    build_keys = orders.select(
        F.col("o_custkey").alias("user_id")
    ).distinct()
    probe = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=False)
    )
    probe_pos = probe.select(
        "user_id",
        "n_rows",
        F.explode(positions(F.col("user_id"))).alias("pos"),
    )
    passed = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("user_id", "n_rows")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") == BLOOM_K)
        .select("user_id", "n_rows")
        .localCheckpoint(eager=False)
    )
    members = probe.join(build_keys, "user_id").select("user_id", "n_rows")
    stats = (
        probe.agg(
            F.count(F.lit(1)).alias("n_probe_keys"),
            F.sum("n_rows").alias("rows_total"),
        )
        .crossJoin(
            F.broadcast(
                members.agg(F.count(F.lit(1)).alias("n_members"))
            )
        )
        .crossJoin(
            F.broadcast(
                passed.agg(
                    F.count(F.lit(1)).alias("n_pass"),
                    F.sum("n_rows").alias("rows_pass"),
                )
            )
        )
    )
    return stats.select(
        "n_probe_keys",
        "n_members",
        "n_pass",
        (F.col("n_pass") - F.col("n_members")).alias("false_pos"),
        # false-positive rate over the NON-members the filter exists
        # to drop; guard the all-members corner with a 0 sentinel
        F.expr(
            "CASE WHEN n_probe_keys > n_members THEN"
            " (10000 * (n_pass - n_members))"
            " div (n_probe_keys - n_members) ELSE 0 END"
        ).alias("fpr_bp"),
        "rows_total",
        "rows_pass",
        F.expr(
            "(10000 * (rows_total - rows_pass)) div rows_total"
        ).alias("row_prune_bp"),
    )


QUERIES["bloom_join_prune"] = bloom_join_prune


def _bloom_pos_duck(key_expr: str) -> str:
    parts = ", ".join(
        f"{hash64_duck(f'CAST({key_expr} AS VARCHAR)', repr(f'bloom{i}'))}"
        f" % {BLOOM_M}"
        for i in range(BLOOM_K)
    )
    return f"[{parts}]"


ORACLES["bloom_join_prune"] = f"""
    WITH b_orders AS (
        SELECT o_custkey FROM orders WHERE {BLOOM_BUILD_PRED}
    ),
    bits AS (
        SELECT DISTINCT unnest({_bloom_pos_duck("o_custkey")}) AS pos
        FROM b_orders
    ),
    build_keys AS (SELECT DISTINCT o_custkey AS user_id FROM b_orders),
    probe AS (
        SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id
    ),
    probe_pos AS (
        SELECT user_id, n_rows,
               unnest({_bloom_pos_duck("user_id")}) AS pos
        FROM probe
    ),
    passed AS (
        SELECT user_id, any_value(n_rows) AS n_rows
        FROM probe_pos JOIN bits USING (pos)
        GROUP BY user_id HAVING count(*) = {BLOOM_K}
    ),
    members AS (
        SELECT p.user_id, p.n_rows FROM probe p
        JOIN build_keys USING (user_id)
    ),
    stats AS (
        SELECT (SELECT count(*) FROM probe) AS n_probe_keys,
               (SELECT CAST(sum(n_rows) AS BIGINT) FROM probe)
                   AS rows_total,
               (SELECT count(*) FROM members) AS n_members,
               (SELECT count(*) FROM passed) AS n_pass,
               (SELECT CAST(coalesce(sum(n_rows), 0) AS BIGINT)
                FROM passed) AS rows_pass
    )
    SELECT n_probe_keys, n_members, n_pass,
           n_pass - n_members AS false_pos,
           CASE WHEN n_probe_keys > n_members THEN
               (10000 * (n_pass - n_members))
               // (n_probe_keys - n_members) ELSE 0 END AS fpr_bp,
           rows_total, rows_pass,
           (10000 * (rows_total - rows_pass)) // rows_total
               AS row_prune_bp
    FROM stats
"""
