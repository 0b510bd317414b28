"""Property tests for functions/exact.py — the pure-bigint half-up
display arithmetic every money/average column rides. The reference
semantics is decimal.Decimal ROUND_HALF_UP; both engine spellings
(`div` / `//`) must reproduce it bit-for-bit for any nonnegative
integer operands, INCLUDING the .5 boundaries where naive
round-a-double diverges between Spark and DuckDB.

Domain bound (same contract the wide form documents below): the
decimal-exactness claim holds while the scaled half-up integer fits a
double's 53-bit mantissa. Past 2^53 the final bigint-to-double
conversion itself rounds, so the SQL value double-rounds (int→double,
then /10^digits) while Decimal single-rounds — a one-ulp divergence
hypothesis found at num=7481119858165, den=3, digits=4. The engines
still agree bit-for-bit with EACH OTHER there (both are IEEE; pinned
in test_beyond_mantissa_engines_agree), which is the invariant the
DuckDB oracle gate actually needs."""

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from bike_analyzer_spark.functions.exact import (
    halfup_ratio_sql,
    halfup_ratio_wide_sql,
)

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


def _display_exact(num: int, den: int, digits: int) -> bool:
    """True iff the scaled half-up integer fits 2^53, i.e. the final
    /10^digits division is the ONLY rounding step (see module
    docstring)."""
    scale = 10**digits
    return (abs(num) * 2 * scale + den) // (den * 2) <= 2**53


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
        if not _display_exact(num, den, digits):
            continue
        assert h == _want(num, den, digits), (num, den, digits, h)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**13),
    st.integers(min_value=1, max_value=10**7),
    st.sampled_from([2, 4]),
)
def test_duck_halfup_matches_decimal(num, den, digits):
    assume(_display_exact(num, den, digits))
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


# ---- 128-bit wide form (halfup_ratio_wide_sql) -------------------------
#
# Operands PAST the bigint lift's wrap point (num * 2e4 > 2^63, i.e.
# num > ~4.6e14 at 4 digits): the case class round-7 ADVICE flagged for
# sum_charge/promo_pct around sf1. The wide form must stay exact while
# the narrow form would silently wrap (Spark) or error (DuckDB).

# The wide form's contract: operands may exceed 64 bits, but the
# DISPLAYED value (quotient * 10^digits) must fit a double's 53-bit
# mantissa — true for any on-screen ratio (q ≤ 1e9 at 6 digits keeps
# the scaled integer ≤ ~1e15 < 2^53; past that, the final
# bigint-to-double conversion itself rounds and no display form is
# exact). Generate num = q*den + r under that bound so the strategy
# exercises >2^63 numerators without violating it.
wide_ops = st.tuples(
    st.integers(min_value=0, max_value=10**9),  # integer part q
    st.integers(min_value=1, max_value=10**18),  # den
    st.integers(min_value=0, max_value=10**18),  # remainder seed
    st.sampled_from([2, 4, 6]),
).map(lambda t: (t[0] * t[1] + (t[2] % t[1]), t[1], t[3]))


@settings(max_examples=10, deadline=None)
@given(st.lists(wide_ops, min_size=1, max_size=30))
def test_spark_wide_halfup_matches_decimal(spark, cases):
    # bigint can't carry 1e22 — ship operands as decimal strings
    rows = [(str(n), str(d), g) for n, d, g in cases]
    df = spark.createDataFrame(rows, "num string, den string, digits int")
    got = df.selectExpr(
        "num",
        "den",
        "digits",
        f"{halfup_ratio_wide_sql('CAST(num AS DECIMAL(38,0))', 'CAST(den AS DECIMAL(38,0))', 2, 'spark')} AS h2",
        f"{halfup_ratio_wide_sql('CAST(num AS DECIMAL(38,0))', 'CAST(den AS DECIMAL(38,0))', 4, 'spark')} AS h4",
        f"{halfup_ratio_wide_sql('CAST(num AS DECIMAL(38,0))', 'CAST(den AS DECIMAL(38,0))', 6, 'spark')} AS h6",
    ).collect()
    for r in got:
        h = {2: r.h2, 4: r.h4, 6: r.h6}[r.digits]
        assert h == _want(int(r.num), int(r.den), r.digits), r


@settings(max_examples=25, deadline=None)
@given(wide_ops)
def test_duck_wide_halfup_matches_decimal(case):
    num, den, digits = case
    con = duckdb.connect()
    expr = halfup_ratio_wide_sql(
        f"CAST('{num}' AS HUGEINT)", f"CAST('{den}' AS HUGEINT)",
        digits, engine="duck",
    )
    [(h,)] = con.execute(f"SELECT {expr}").fetchall()
    assert h == _want(num, den, digits), (num, den, digits, h)


def test_wide_halfup_agrees_where_narrow_wraps(spark):
    """The exact regression from round-7 ADVICE: a charge-unit sum of
    4.6e15 has ~10x bigint headroom left at sf0.1; at 10x the data the
    narrow lift (num * 2e2) wraps in non-ANSI Spark. Pin that the wide
    form produces the HALF_UP value there and that the engines agree."""
    con = duckdb.connect()
    num, den = 50_000_000_000_000_000, 1_000_000  # ~sf1 charge sum
    assert num * 200 > 2**63  # the narrow form genuinely wraps here
    sexpr = halfup_ratio_wide_sql(str(num), str(den), 2, "spark")
    dexpr = halfup_ratio_wide_sql(str(num), str(den), 2, "duck")
    [sh] = spark.range(1).selectExpr(f"{sexpr} AS h").collect()
    [(dh,)] = con.execute(f"SELECT {dexpr}").fetchall()
    assert sh.h == dh == _want(num, den, 2)


signed_ops = st.tuples(
    st.integers(min_value=-(10**13), max_value=10**13),
    st.integers(min_value=1, max_value=10**7),
    st.sampled_from([2, 4]),
)


@settings(max_examples=40, deadline=None)
@given(signed_ops)
def test_duck_signed_halfup_matches_decimal(case):
    from bike_analyzer_spark.functions.exact import (
        halfup_signed_ratio_sql,
    )

    num, den, digits = case
    assume(_display_exact(num, den, digits))
    con = duckdb.connect()
    expr = halfup_signed_ratio_sql(str(num), str(den), digits, "duck")
    [(h,)] = con.execute(f"SELECT {expr}").fetchall()
    sign = -1 if num < 0 else 1
    assert h == sign * _want(abs(num), den, digits), (num, den, h)


def test_beyond_mantissa_engines_agree(spark):
    """Past the 2^53 display bound no form is decimal-exact (the
    bigint→double conversion rounds before the /10^digits divide),
    but both engines take the same IEEE double path, so the oracle
    gate's Spark==DuckDB invariant must still hold bit-for-bit.
    Pins hypothesis' falsifying example and its neighborhood."""
    from bike_analyzer_spark.functions.exact import (
        halfup_signed_ratio_sql,
    )

    con = duckdb.connect()
    cases = [(7481119858165, 3, 4), (-7481119858165, 3, 4),
             (9999999999999, 7, 4), (10**13, 3, 4)]
    for num, den, digits in cases:
        assert not _display_exact(num, den, digits)
        sexpr = halfup_signed_ratio_sql(str(num), str(den), digits,
                                        "spark")
        dexpr = halfup_signed_ratio_sql(str(num), str(den), digits,
                                        "duck")
        [sh] = spark.range(1).selectExpr(f"{sexpr} AS h").collect()
        [(dh,)] = con.execute(f"SELECT {dexpr}").fetchall()
        assert sh.h == dh, (num, den, digits, sh.h, dh)


def test_signed_halfup_cross_engine_on_negatives(spark):
    """The exact divergence the signed form removes: truncating vs
    flooring integer division disagree on negative numerators, so
    the unsigned form would silently split the engines there."""
    con = duckdb.connect()
    cases = [(-6845694, 1000000, 2), (-1, 3, 2), (-5, 1000, 4),
             (-999999, 2, 2)]
    from bike_analyzer_spark.functions.exact import (
        halfup_signed_ratio_sql,
    )

    for num, den, digits in cases:
        sexpr = halfup_signed_ratio_sql(str(num), str(den), digits,
                                        "spark")
        dexpr = halfup_signed_ratio_sql(str(num), str(den), digits,
                                        "duck")
        [sh] = spark.range(1).selectExpr(f"{sexpr} AS h").collect()
        [(dh,)] = con.execute(f"SELECT {dexpr}").fetchall()
        sign = -1 if num < 0 else 1
        assert sh.h == dh == sign * _want(abs(num), den, digits)


negatives = st.lists(
    st.tuples(
        st.integers(min_value=-(10**15), max_value=10**15),
        st.sampled_from([3_600_000_000, 86_400_000_000, 1_000_000, 1000, 7]),
    ),
    min_size=1,
    max_size=50,
)


@settings(max_examples=10, deadline=None)
@given(negatives)
def test_floordiv_pair_is_python_floor_on_any_sign(spark, cases):
    """floordiv_sql (Spark) and floordiv_duck (DuckDB) both equal
    Python's // (mathematical floor) for ANY numerator sign — the
    bucket-semantics fix for pre-epoch timestamps (r11 ADVICE).
    Note the raw operators aren't floor: Spark `div` truncates
    toward zero, and DuckDB 1.0.0's integer `//` ALSO truncates
    (asserted below), so a naive div-vs-// pair agrees cross-engine
    but puts an hour-before-epoch event in bucket 0, not -1."""
    from bike_analyzer_spark.functions.exact import (
        floordiv_duck,
        floordiv_sql,
    )

    con = duckdb.connect()
    for num, den in cases:
        sexpr = floordiv_sql(str(num), den)
        dexpr = floordiv_duck(str(num), den)
        [row] = spark.range(1).selectExpr(f"{sexpr} AS q").collect()
        [(dq,)] = con.execute(f"SELECT {dexpr}").fetchall()
        assert row.q == dq == num // den, (num, den, row.q, dq)


def test_raw_integer_division_truncates_on_both_engines():
    """Pins the measured baseline the floordiv pair exists to fix:
    both engines' raw integer division truncates toward zero (if a
    DuckDB upgrade ever flips `//` to true floor, this fails and the
    oracle helper can be simplified)."""
    con = duckdb.connect()
    assert con.execute("SELECT (-1) // 3").fetchone()[0] == 0
    assert con.execute("SELECT (-5) // 3").fetchone()[0] == -1
