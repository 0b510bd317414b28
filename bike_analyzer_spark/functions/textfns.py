"""Text/hash column primitives shared by the text-analysis and dedup
operators (the LLM-data-pipeline pack).

Engine-portable hashing: Spark and DuckDB share no native hash
function, but both ship md5 over UTF-8 bytes. `hash64` therefore
derives a 64-bit-ish (actually 32-bit range, stored in a bigint —
collision space is fine for banding/minhash at any scale because
hashes are compared per-shingle, not globally unique) integer from an
md5 hex prefix:

  Spark : CAST(conv(substr(md5(concat(salt, ':', s)), 1, 8), 16, 10)
               AS BIGINT)
  DuckDB: CAST(('0x' || substr(md5(salt || ':' || s), 1, 8)) AS BIGINT)

Both yield the same unsigned 32-bit value (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (reference-free; the LLM-pipeline
    token-counting primitive). DuckDB twin:
    string_split_regex(trim(text), '\\s+')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def hash64(col: Column, salt: str | Column | None = None) -> Column:
    """Portable integer hash of a string column (see module doc)."""
    if salt is not None:
        s = F.lit(salt) if isinstance(salt, str) else salt
        col = F.concat(s.cast("string"), F.lit(":"), col)
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 8), 16, 10).cast(
        "bigint"
    )


def hash64_duck(expr: str, salt_expr: str | None = None) -> str:
    """The DuckDB twin of `hash64`, as SQL text for oracle queries."""
    inner = expr if salt_expr is None else f"{salt_expr} || ':' || {expr}"
    return f"CAST(('0x' || substr(md5({inner}), 1, 8)) AS BIGINT)"


def shingle_exprs(tokens_col: str, n: int = 3) -> Column:
    """Array of n-token shingles (space-joined) from a token array
    column. Empty when the doc has fewer than n tokens (guarded:
    Spark's sequence() infers a NEGATIVE step when start > stop, so
    the unguarded form would produce garbage, not an empty array).

    DuckDB twin (range() is end-exclusive):
      CASE WHEN len(t) >= {n} THEN
        list_transform(range(1, len(t) - {n} + 2),
                       i -> array_to_string(t[i:i+{n-1}], ' '))
      ELSE [] END
    """
    t = F.col(tokens_col)
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_duck(tokens_expr: str, n: int = 3) -> str:
    """DuckDB twin of `shingle_exprs` over a token-list SQL expr."""
    return (
        f"CASE WHEN len({tokens_expr}) >= {n} THEN "
        f"list_transform(range(1, len({tokens_expr}) - {n} + 2), "
        f"i -> array_to_string(({tokens_expr})[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )
