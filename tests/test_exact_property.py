"""Property tests for functions/exact.py — the pure-bigint half-up
display arithmetic every money/average column rides. The reference
semantics is decimal.Decimal ROUND_HALF_UP; both engine spellings
(`div` / `//`) must reproduce it bit-for-bit for any nonnegative
integer operands, INCLUDING the .5 boundaries where naive
round-a-double diverges between Spark and DuckDB."""

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bike_analyzer_spark.functions.exact import halfup_ratio_sql

pairs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**13),
        st.integers(min_value=1, max_value=10**7),
        st.sampled_from([2, 4]),
    ),
    min_size=1,
    max_size=50,
)


def _want(num: int, den: int, digits: int) -> float:
    q = Decimal(1).scaleb(-digits)
    return float(
        (Decimal(num) / Decimal(den)).quantize(q, rounding=ROUND_HALF_UP)
    )


@settings(max_examples=10, deadline=None)
@given(pairs)
def test_spark_halfup_matches_decimal(spark, cases):
    df = spark.createDataFrame(cases, "num long, den long, digits int")
    got = [
        (
            r.num,
            r.den,
            r.digits,
            r.h2 if r.digits == 2 else r.h4,
        )
        for r in df.selectExpr(
            "num",
            "den",
            "digits",
            f"{halfup_ratio_sql('num', 'den', 2, 'spark')} AS h2",
            f"{halfup_ratio_sql('num', 'den', 4, 'spark')} AS h4",
        ).collect()
    ]
    for num, den, digits, h in got:
        assert h == _want(num, den, digits), (num, den, digits, h)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**13),
    st.integers(min_value=1, max_value=10**7),
    st.sampled_from([2, 4]),
)
def test_duck_halfup_matches_decimal(num, den, digits):
    con = duckdb.connect()
    expr = halfup_ratio_sql(str(num), str(den), digits, engine="duck")
    [(h,)] = con.execute(f"SELECT {expr}").fetchall()
    assert h == _want(num, den, digits), (num, den, digits, h)


def test_exact_half_boundaries_agree_across_engines(spark):
    """The exact .5 boundaries (num*scale*2 ≡ den mod 2*den): the
    case class where round()-on-double provably differs between the
    engines; the halfup form must give HALF_UP on both."""
    cases = [(5, 1000, 2), (15, 1000, 2), (25, 1000, 2),
             (125, 10**4, 4), (375, 10**4, 4), (50, 10**4, 2)]
    con = duckdb.connect()
    df = spark.createDataFrame(cases, "num long, den long, digits int")
    srows = df.selectExpr(
        "num", "den", "digits",
        f"{halfup_ratio_sql('num', 'den', 2, 'spark')} AS h2",
        f"{halfup_ratio_sql('num', 'den', 4, 'spark')} AS h4",
    ).collect()
    for r in srows:
        h = r.h2 if r.digits == 2 else r.h4
        want = _want(r.num, r.den, r.digits)
        dexpr = halfup_ratio_sql(str(r.num), str(r.den), r.digits, "duck")
        [(dh,)] = con.execute(f"SELECT {dexpr}").fetchall()
        assert h == dh == want, (r.num, r.den, r.digits, h, dh, want)
