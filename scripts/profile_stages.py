"""Per-stage time attribution for one or more queries (dev tool).

Runs each named query through the noop sink on a session with the UI
enabled, then reads the UI REST API for per-stage wall/run times and
shuffle volumes. Guide §1.1/§7.1 empirical loop without a browser.

Usage: python scripts/profile_stages.py q1 [q2 ...] [--sf=DIR] [--reps=N]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.1"
    reps = 1
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])

    import os

    from pyspark.sql import SparkSession

    from bike_analyzer_spark.session import configure

    import __spark_entry__ as em

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("profile-stages")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .getOrCreate()
    )
    configure(spark)
    qs = em.queries()
    spark.read.parquet(f"{sf}/events.parquet").count()  # warm

    def rest(path: str):
        app_id = spark.sparkContext.applicationId
        url = f"http://localhost:4050/api/v1/applications/{app_id}{path}"
        with urllib.request.urlopen(url) as r:
            return json.load(r)

    for name in names:
        sc = spark.sparkContext
        sc.setJobDescription(f"profile:{name}")
        jobs_before = {j["jobId"] for j in rest("/jobs")}
        t0 = time.perf_counter()
        for _ in range(reps):
            qs[name](spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        time.sleep(0.5)
        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: wall={wall:.3f}s over {reps} rep(s), "
              f"{len(jobs)} jobs, {len(stage_ids)} stages ===")
        rows = []
        for sid in stage_ids:
            try:
                for att in rest(f"/stages/{sid}"):
                    if att["status"] == "SKIPPED":
                        continue
                    dur = (att.get("executorRunTime") or 0) / 1000.0
                    sub = time.mktime(time.strptime(
                        att["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
                    comp = time.mktime(time.strptime(
                        att["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
                    rows.append((
                        sid,
                        att["numCompleteTasks"],
                        dur,
                        comp - sub,
                        (att.get("shuffleReadBytes") or 0) / 1e6,
                        (att.get("shuffleWriteBytes") or 0) / 1e6,
                        (att.get("name") or "")[:60],
                    ))
            except Exception:
                pass
        rows.sort(key=lambda r: -r[2])
        print(f"{'stage':>5} {'tasks':>5} {'runT':>8} {'wallT':>6} "
              f"{'shR MB':>7} {'shW MB':>7}  name")
        for r in rows[:25]:
            print(f"{r[0]:>5} {r[1]:>5} {r[2]:>8.2f} {r[3]:>6.0f} "
                  f"{r[4]:>7.2f} {r[5]:>7.2f}  {r[6]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
