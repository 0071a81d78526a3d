"""Per-query cost attribution for the optimization rounds.

For each registry query (or a named subset), measures in one process:
  - build_s: wall time of `fn(spark, sf_dir)` — Python driver work
    (plan construction, fixture reads/builds, any driver-side loops)
  - exec_s: wall time of the `.count()` action — JVM planning +
    execution of the returned DataFrame
  - jobs: Spark jobs launched across BOTH phases (status tracker
    delta) — the per-query fixed-overhead multiplier; at sf0.1 a job
    costs ~10-40 ms of scheduling alone, so a query firing 30 jobs
    pays ~1 s before any data is touched.

Run AFTER the fixture cache is warm (bench or a prior profile run):
fixture builds otherwise land in build_s of whichever query builds
them first and distort the attribution.

Usage: python tools/profile_queries.py [query ...] [--top N]
Writes tools/PROFILE_LOCAL.json and prints a sorted table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 0
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1]) if "=" in a else 0

    from tools.fixture_cache import default_fixture_env

    default_fixture_env()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("profile")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
             .config("spark.python.sql.dataFrameDebugging.enabled",
                     "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    from __spark_entry__ import queries

    tracker = spark.sparkContext.statusTracker()
    rows = {}
    for name, fn in queries().items():
        if name.startswith("family_"):
            continue
        if args and name not in args:
            continue
        spark.sparkContext.setJobDescription(name)
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
        except Exception as e:  # noqa: BLE001
            print(f"# error {name}: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        j1 = len(tracker.getJobIdsForGroup(None) or [])
        rows[name] = {"build_s": round(t1 - t0, 3),
                      "exec_s": round(t2 - t1, 3),
                      "total_s": round(t2 - t0, 3),
                      "jobs": j1 - j0}
    spark.sparkContext.setJobDescription(None)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "PROFILE_LOCAL.json")
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "cpus": cpus, "rows": rows}, f,
                  indent=1)
        f.write("\n")

    order = sorted(rows.items(), key=lambda kv: -kv[1]["total_s"])
    if top:
        order = order[:top]
    tot_b = sum(r["build_s"] for r in rows.values())
    tot_e = sum(r["exec_s"] for r in rows.values())
    tot_j = sum(r["jobs"] for r in rows.values())
    print(f"{'query':40s} {'total':>7s} {'build':>7s} {'exec':>7s} {'jobs':>5s}")
    for name, r in order:
        print(f"{name:40s} {r['total_s']:7.2f} {r['build_s']:7.2f} "
              f"{r['exec_s']:7.2f} {r['jobs']:5d}")
    print(f"{'TOTAL (' + str(len(rows)) + ' queries)':40s} "
          f"{tot_b + tot_e:7.2f} {tot_b:7.2f} {tot_e:7.2f} {tot_j:5d}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
