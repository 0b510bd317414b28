"""Shared column-expression helpers (no UDFs — everything stays inside
whole-stage codegen). Cross-engine contract: every helper here has an
exact DuckDB-SQL twin used by the oracles, so hashes and token lists
agree byte-for-byte between Spark and the correctness oracle.
"""

from .textfns import hash64, shingle_exprs, tokens

__all__ = ["hash64", "shingle_exprs", "tokens"]
