"""Declarative constraints: detection of every rule kind, one-pass
row rules, and the all-or-nothing enforced versioned commit."""

import pytest
from pyspark.sql import functions as F

from bike_analyzer_spark.sources import constraints as C
from bike_analyzer_spark.sources import versioned
from bike_analyzer_spark.sources.catalog import load
from tests.conftest import SF_DIR_SMOKE


def _docs(spark):
    return load(spark, SF_DIR_SMOKE, "documents")


def test_clean_frame_passes_all_rules(spark):
    docs = _docs(spark)
    rules = [
        C.not_null("doc_id"),
        C.not_null("text"),
        C.check("n_chars_consistent", "n_chars = length(text)"),
        C.unique("doc_id"),
    ]
    assert C.validate(docs, rules) == []


def test_each_rule_kind_detects_its_violation(spark):
    docs = _docs(spark)
    broken = (
        docs.withColumn(
            "lang",
            F.when(F.col("doc_id") % 50 == 0, None).otherwise(
                F.col("lang")
            ),
        )
        .withColumn(
            "n_chars",
            F.when(F.col("doc_id") == 3, -1).otherwise(F.col("n_chars")),
        )
    )
    dup = broken.unionByName(broken.limit(2))  # duplicate two keys
    events = load(spark, SF_DIR_SMOKE, "events").withColumn(
        "user_id",
        F.when(F.col("event_id") % 100 == 0, F.lit(10**9)).otherwise(
            F.col("user_id")
        ),
    )
    customers = load(spark, SF_DIR_SMOKE, "customer")
    report = {
        r["rule"]: r["n_bad"]
        for r in C.validate(
            dup,
            [
                C.not_null("lang"),
                C.check("n_chars_nonneg", "n_chars >= 0"),
                C.unique("doc_id"),
            ],
        )
    }
    assert report["not_null(lang)"] >= 1
    assert report["n_chars_nonneg"] == 1
    assert report["unique(doc_id)"] == 2
    fk = C.validate(
        events,
        [C.foreign_key("user_id", customers.withColumnRenamed(
            "c_custkey", "user_id"), "user_id")],
    )
    assert fk and fk[0]["n_bad"] >= 1


def test_null_check_predicate_counts_as_violation(spark):
    docs = _docs(spark).withColumn(
        "maybe",
        F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.lit(1)),
    )
    # three-valued logic: NULL > 0 is NULL, which must NOT sneak
    # through as "not a violation"
    rep = C.validate(docs, [C.check("maybe_pos", "maybe > 0")])
    assert rep and rep[0]["n_bad"] == docs.filter(
        "maybe IS NULL").count()


def test_enforce_commit_is_all_or_nothing(spark, tmp_path):
    table = str(tmp_path / "tbl")
    docs = _docs(spark)
    v1 = C.enforce_commit(docs, table, [C.unique("doc_id")])
    assert v1 == 1
    bad = docs.unionByName(docs.limit(1))
    with pytest.raises(C.ConstraintViolation) as ei:
        C.enforce_commit(bad, table, [C.unique("doc_id")])
    assert ei.value.report[0]["rule"] == "unique(doc_id)"
    # nothing published: latest is still the good version
    assert versioned.latest_version(table) == 1
    assert versioned.read(spark, table).count() == docs.count()
