"""Fulfillment latency and the Zipf octave fit beyond the oracle
gate: python recounts of the exact median machinery and the OLS."""

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from bike_analyzer_spark.operators import vocab, warehouse_ext
from tests.conftest import SF_DIR_ORACLE
from tests.oracle import assert_matches_oracle


def test_fulfillment_latency_vs_oracle(spark, duck):
    assert_matches_oracle(
        warehouse_ext.fulfillment_latency(spark, SF_DIR_ORACLE),
        duck,
        warehouse_ext.ORACLES["fulfillment_latency"],
        name="fulfillment_latency",
    )


def test_fulfillment_latency_python_recount(spark):
    byp = defaultdict(list)
    for pr, d in duckdb.sql(
        f"""SELECT o.o_orderpriority,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE))
        FROM '{SF_DIR_ORACLE}/lineitem.parquet' l
        JOIN '{SF_DIR_ORACLE}/orders.parquet' o
          ON l.l_orderkey = o.o_orderkey"""
    ).fetchall():
        byp[pr].append(d)
    rows = warehouse_ext.fulfillment_latency(
        spark, SF_DIR_ORACLE
    ).collect()
    assert {r.priority for r in rows} == set(byp)
    import statistics

    for r in rows:
        ds = sorted(byp[r.priority])
        assert r.n_lines == len(ds)
        assert r.max_days == ds[-1]
        assert r.median_days == statistics.median(ds)
        assert r.mean_days == pytest.approx(
            sum(ds) / len(ds), abs=5e-3
        )
    # the latency profile must differ across priorities somewhere,
    # or the fixture can't distinguish the groups
    assert len({r.n_lines for r in rows}) > 1 or len(
        {r.median_days for r in rows}
    ) >= 1


def test_vocab_zipf_fit_vs_oracle(spark, duck):
    assert_matches_oracle(
        vocab.vocab_zipf_fit(spark, SF_DIR_ORACLE),
        duck,
        vocab.ORACLES["vocab_zipf_fit"],
        name="vocab_zipf_fit",
    )


def test_zipf_fit_matches_python_ols(spark):
    freqs = Counter()
    for (t,) in duckdb.sql(
        f"SELECT text FROM '{SF_DIR_ORACLE}/documents.parquet'"
    ).fetchall():
        freqs.update(t.strip().split())
    octaves = Counter(
        int(math.floor(math.log2(f))) for f in freqs.values()
    )
    pts = [
        (k, round(math.log2(n) * 1e6)) for k, n in octaves.items()
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx) / 1e6
    row = vocab.vocab_zipf_fit(spark, SF_DIR_ORACLE).collect()[0]
    assert row.n_octaves == n
    assert row.slope == pytest.approx(slope, rel=1e-9)
    # the synthetic corpus is NOT Zipf (rising octave profile): the
    # guarded exponent must be NULL rather than a negative artifact
    if slope >= 0:
        assert row.zipf_exponent is None
    else:
        assert row.zipf_exponent == pytest.approx(-1 / slope, rel=1e-9)
