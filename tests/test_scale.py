"""Salted aggregation exactness + approx-distinct error contract."""

from pyspark.sql import functions as F

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
