"""Benchmark harness — times the headline query corpus and prints ONE
JSON line the driver records as BENCH_r{N}.json.

Usage: python bench.py
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)

Each query is forced end-to-end through the `noop` sink: the full plan
executes on executors with zero driver materialization, so a query
returning 600k rows is timed as fairly as one returning 1. Times
exclude session startup (fixed overhead, not query throughput).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> int:
    from bike_analyzer_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bike-analyzer-spark-bench")
    qs = entry_mod.queries()

    # Warm the JVM + parquet footers once so per-query times measure the
    # queries, not first-touch costs.
    spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # one bad query must not kill the number
            errors[name] = f"{type(e).__name__}: {e}"[:200]

    total = round(sum(timings.values()), 3)
    line = {
        "metric": "query_corpus_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
    }
    if errors:
        line["errors"] = errors
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
