"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python scripts/explain_queries.py --tag r12 --suffix before q1 q2 ...
       python scripts/explain_queries.py --tag r12 --suffix before --all
Writes plans/<tag>/<query>_<suffix>.txt. Planning only — no execution.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag, suffix, sf = "r12", "before", "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    from bike_analyzer_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark(app_name="explain-queries")
    qs = em.queries()
    if "--all" in sys.argv[1:]:
        names = sorted(qs)
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
