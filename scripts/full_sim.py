"""Driver-contract simulation over the WHOLE query corpus: run every
`queries()` entry and its DuckDB oracle side-by-side and compare the
sorted row multisets exactly — the same gate the round driver applies
to the first 50 queries at sf0.01, extended to all queries and any
scale factor.

Running this at sf0.1 (not just the driver's sf0.01) is what caught
round 6's cross-engine rounding-boundary bugs: averages of 2-decimal
data over 2^a·5^b-sized groups flip one ulp between Spark's
BigDecimal HALF_UP and DuckDB's double rounding, and which groups
hit the boundary depends on the corpus size.

Usage: python scripts/full_sim.py [sf_dir] [shuffle_partitions]
Exit code 0 iff every query matches.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import __spark_entry__ as em
    from bike_analyzer_spark.session import get_spark

    spark = get_spark(shuffle_partitions=parts)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = em.queries(), em.oracle_sql()
    bad = []
    for i, (name, fn) in enumerate(qs.items()):
        try:
            srows = sorted(map(tuple, fn(spark, sf_dir).collect()))
            orows = sorted(con.sql(oracles[name]).fetchall())
            ok = srows == orows
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            ok = False
            print(f"ERR {name}: {type(e).__name__}: {str(e)[:200]}")
        print(f"{i + 1}/{len(qs)} {name} {'ok' if ok else 'MISMATCH'}")
        if not ok:
            bad.append(name)
    print(f"TOTAL {len(qs)} BAD {len(bad)} {bad if bad else ''}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
