"""Salted aggregation exactness + approx-distinct error contract."""

from pyspark.sql import functions as F

from bike_analyzer_spark.operators import scale
from bike_analyzer_spark.operators.scale import approx_distinct, salted_sum_count
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_ORACLE

def test_salted_agg_equals_direct(spark):
    ev = load(spark, SF_DIR_ORACLE, "events")
    direct = {
        r.user_id: (round(r.sum_value, 6), r.n)
        for r in ev.groupBy("user_id").agg(
            F.sum("value").alias("sum_value"), F.count(F.lit(1)).alias("n")
        ).collect()
    }
    salted = {
        r.user_id: (round(r.sum_value, 6), r.n)
        for r in salted_sum_count(ev, "user_id", "value", "event_id").collect()
    }
    assert salted == direct

def test_salted_agg_spreads_hot_key(spark):
    """Phase-1 output must contain multiple rows for a key (the whole
    point: a hot key's load splits across salts)."""
    ev = load(spark, SF_DIR_ORACLE, "events")
    salt = F.pmod(F.hash(F.col("event_id")), F.lit(16))
    phase1 = ev.groupBy("user_id", salt.alias("s")).count()
    per_key = phase1.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert per_key > 1

def test_approx_distinct_error_bound(spark):
    ev = load(spark, SF_DIR_ORACLE, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.agg(approx_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) <= max(3, 0.06 * exact)


def test_cms_vs_oracle(spark, duck):
    """The count-min sketch is bit-identical cross-engine (portable
    integer hashing) — full value equality, not just an error bound."""
    from tests.conftest import SF_DIR_ORACLE
    from tests.oracle import assert_matches_oracle

    df = scale.cms_user_counts(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, scale.ORACLES["cms_user_counts"], name="cms_user_counts"
    )


def test_cms_is_an_upper_bound(spark):
    """estimate >= exact for every key — the CMS one-sided error
    guarantee (collisions only add)."""
    from tests.conftest import SF_DIR_ORACLE

    rows = scale.cms_user_counts(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.cms_est >= r.exact_n
        assert r.overcount == r.cms_est - r.exact_n


def test_grid_quantiles_within_bound_and_partition_invariant(spark):
    from bike_analyzer_spark.operators.scale import grid_quantiles
    from bike_analyzer_spark.sources.catalog import load
    from tests.conftest import SF_DIR_ORACLE

    ev = load(spark, SF_DIR_ORACLE, "events")
    bounds = ev.agg(F.min("value"), F.max("value")).first()
    lo, hi = bounds[0], bounds[1]
    buckets = 1024
    got = {
        (r.event_type, r.q): r.value
        for r in grid_quantiles(
            ev, "event_type", "value", lo, hi, buckets=buckets
        ).collect()
    }
    # rank-based exact quantile (the ceil(q*n)-th smallest value),
    # the reference the guarantee is stated against
    import math
    from collections import defaultdict

    vals = defaultdict(list)
    for row in ev.select("event_type", "value").collect():
        vals[row.event_type].append(row.value)
    exact = {}
    for k, vs in vals.items():
        vs.sort()
        for q in (0.5, 0.9, 0.99):
            exact[(k, q)] = vs[math.ceil(q * len(vs)) - 1]
    bound = (hi - lo) / buckets
    assert set(got) == set(exact) and len(got) >= 15
    for k, v in got.items():
        assert abs(v - exact[k]) <= bound + 1e-9, (k, v, exact[k])

    # partitioning invariance: identical numbers from a different
    # physical layout (integer histogram => no order sensitivity)
    re = {
        (r.event_type, r.q): r.value
        for r in grid_quantiles(
            ev.repartition(7, "event_id"),
            "event_type", "value", lo, hi, buckets=buckets,
        ).collect()
    }
    assert re == got


def test_grid_quantiles_integer_rank_on_float_boundary(spark):
    """q*n that lands just above an integer in binary (0.07*100 =
    7.000000000000001) must NOT overshoot the rank: the one-bucket
    bound holds for non-default quantiles too (round-7 ADVICE)."""
    from bike_analyzer_spark.operators.scale import grid_quantiles

    df = spark.range(100).select(
        F.lit("k").alias("k"), (F.col("id") + 1).cast("double").alias("v")
    )
    [r] = grid_quantiles(
        df, "k", "v", 0.0, 100.0, qs=(0.07,), buckets=100
    ).collect()
    # true rank-7 value is 7.0; its covering bucket's upper edge is
    # 8.0 — float ceil gave rank 8 => 9.0, two widths off
    assert r.value == 8.0


def test_promoted_scale_queries_vs_oracle(spark, duck):
    """Round-8 driver promotions: the salted two-phase sum and the
    grid-quantile histogram get the SAME full value gate the driver
    runs (both are deterministic integer math — see module notes)."""
    from tests.oracle import assert_matches_oracle

    for name in ("scale_salted_sums", "scale_grid_quantiles"):
        df = scale.QUERIES[name](spark, SF_DIR_ORACLE)
        assert_matches_oracle(df, duck, scale.ORACLES[name], name=name)


def test_kmins_vs_oracle(spark, duck):
    from tests.conftest import SF_DIR_ORACLE
    from tests.oracle import assert_matches_oracle

    df = scale.kmins_user_estimate(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, scale.ORACLES["kmins_user_estimate"], name="kmins"
    )


def test_kmins_accuracy_and_merge(spark):
    """|err| within ~2/sqrt(m) of exact when the sketch is full, and
    the sketch MERGES: minima of a union = elementwise min of the
    parts' minima (the mergeability HLL shares and CMS lacks for
    distinct counting)."""
    from tests.conftest import SF_DIR_ORACLE

    rows = scale.kmins_user_estimate(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.filled == scale.KMINS_M  # sketch saturated at sf0.01
        assert abs(r.err_bp) <= 10000 * 2 / scale.KMINS_M**0.5, r
    # merge property on the raw minima: split events in half by
    # event_id parity, min-merge the two sketches, compare to the
    # one-shot sketch
    from bike_analyzer_spark.functions.textfns import hash64
    from bike_analyzer_spark.sources.catalog import load
    from pyspark.sql import functions as F

    ev = load(spark, SF_DIR_ORACLE, "events").select(
        "event_id",
        F.pmod(
            hash64(F.col("user_id").cast("string"), scale.KMINS_BSALT),
            F.lit(scale.KMINS_M),
        ).alias("bucket"),
        hash64(F.col("user_id").cast("string"), scale.KMINS_VSALT).alias(
            "v"
        ),
    )

    def sketch(df):
        return {
            (r.bucket): r.mv
            for r in df.groupBy("bucket")
            .agg(F.min("v").alias("mv"))
            .collect()
        }

    whole = sketch(ev)
    left = sketch(ev.filter(F.col("event_id") % 2 == 0))
    right = sketch(ev.filter(F.col("event_id") % 2 == 1))
    merged = {
        b: min(left.get(b, scale.KMINS_R), right.get(b, scale.KMINS_R))
        for b in set(left) | set(right)
    }
    assert merged == whole


def test_cms_join_size_vs_oracle(spark, duck):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(
        scale.cms_join_size(spark, SF_DIR_ORACLE),
        duck,
        scale.ORACLES["cms_join_size"],
        "cms_join_size",
    )


def test_cms_join_size_never_underestimates(spark):
    """The CMS inner product is a one-sided estimator: collisions
    only ADD positive products, so est >= exact for every audited
    join — the property that makes it safe for planner sizing."""
    for r in scale.cms_join_size(spark, SF_DIR_ORACLE).collect():
        assert r.est >= r.exact, (r.join_name, r.est, r.exact)
        assert r.over_bp >= 10000


def test_bloom_join_prune_vs_oracle(spark, duck):
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(
        scale.bloom_join_prune(spark, SF_DIR_ORACLE),
        duck,
        scale.ORACLES["bloom_join_prune"],
        "bloom_join_prune",
    )


def test_bloom_never_false_negative(spark):
    """Every true member passes the filter (the property that makes
    a Bloom filter safe to push below the shuffle): n_pass >=
    n_members, false positives >= 0, and row pruning only ever drops
    non-member rows."""
    r = scale.bloom_join_prune(spark, SF_DIR_ORACLE).first()
    assert r.n_pass >= r.n_members
    assert r.false_pos == r.n_pass - r.n_members >= 0
    assert r.rows_pass <= r.rows_total
    assert 0 <= r.fpr_bp <= 10000
    # the audit is non-degenerate at this SF: real non-members exist
    assert r.n_probe_keys > r.n_members


def test_hll_sliding_vs_oracle(spark, duck):
    from tests.oracle import assert_matches_oracle

    df = scale.hll_sliding_reach(spark, SF_DIR_ORACLE)
    assert_matches_oracle(
        df, duck, scale.ORACLES["hll_sliding_reach"], name="hll_sliding"
    )


def test_hll_sliding_window_merge_law(spark):
    """Mergeability in the TIME dimension — the property the day-
    grain register table exists for: for every report day, the
    trailing-window register state (per-register max over the day
    sketches) must equal the register state computed DIRECTLY from
    the union of that window's raw events; therefore the sliding
    estimate equals the direct estimate bit-for-bit. Checked on
    every day of the smoke corpus."""
    from pyspark.sql import functions as F

    from bike_analyzer_spark.functions.textfns import hash64
    from tests.conftest import SF_DIR_SMOKE

    sliding = {
        r.day: (r.filled, r.hll_estimate)
        for r in scale.hll_sliding_reach(spark, SF_DIR_SMOKE).collect()
    }
    ev = scale.load(spark, SF_DIR_SMOKE, "events").select(
        F.expr(f"unix_micros(ts) div {scale._DAY_US}").alias("day"),
        hash64(F.col("user_id").cast("string"), scale.HLL_SALT).alias("h"),
    )
    for day in sorted(sliding):
        direct = (
            ev.where(
                (F.col("day") >= day - (scale.SLIDE_DAYS - 1))
                & (F.col("day") <= day)
            )
            .select(
                F.expr(f"h div {1 << scale.HLL_LOW_BITS}").alias("reg"),
                F.expr(f"h % {1 << scale.HLL_LOW_BITS}").alias("lo"),
            )
            .selectExpr("reg", f"{scale._RHO} AS rho")
            .groupBy("reg")
            .agg(F.max("rho").alias("mr"))
            .agg(
                F.count(F.lit(1)).alias("filled"),
                F.sum(
                    F.expr(
                        "shiftleft(CAST(1 AS BIGINT), "
                        f"{scale.HLL_LOW_BITS + 1} - mr)"
                    )
                ).alias("s_filled"),
            )
            .selectExpr(
                f"CAST({scale.HLL_M} AS BIGINT) AS m",
                "filled",
                f"s_filled + (CAST({scale.HLL_M} AS BIGINT) - filled)"
                f" * {1 << (scale.HLL_LOW_BITS + 1)} AS s",
                f"CAST({scale.HLL_M} AS BIGINT) - filled AS v",
            )
            .selectExpr("filled", f"{scale._EST} AS est")
            .collect()[0]
        )
        assert (direct.filled, direct.est) == sliding[day], f"day {day}"
