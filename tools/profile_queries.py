#!/usr/bin/env python
"""Per-query cost split: plan construction (driver/Py4J + analysis) vs
execution (noop sink), plus job counts. Optimization-round instrumentation
(guide §1): tells whether a slow row needs a plan-shape fix (executor) or
a construction fix (driver), and how many Spark jobs each query launches
(multi-job queries pay scheduler floors per job).

Usage: PYTHONPATH=. python tools/profile_queries.py [query ...]
       (no args = full inventory)
Writes tools/profile_out.json.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
    from open_data_lakehouse_demo_spark.session import get_spark

    spark = get_spark(app_name="profile", cpus=cpus)
    sc = spark.sparkContext
    names = sys.argv[1:] or list(QUERIES)

    import gc
    import statistics

    tracker = sc._jsc.sc().statusTracker()

    out: dict[str, dict] = {}
    for name in names:
        q = QUERIES[name]
        sc.setJobDescription(f"profile:{name}")
        # warm-up (also warms session caches exactly like bench.py)
        df = q.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        gc.collect()

        build_t, exec_t = [], []
        jobs0 = len(tracker.getJobIdsForGroup(None))
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build_t.append(t1 - t0)
            exec_t.append(t2 - t1)
            gc.collect()
        jobs1 = len(tracker.getJobIdsForGroup(None))
        out[name] = {
            "build_s": round(statistics.median(build_t), 4),
            "exec_s": round(statistics.median(exec_t), 4),
            "total_s": round(
                statistics.median(b + e for b, e in zip(build_t, exec_t)), 4
            ),
            "jobs_per_run": round((jobs1 - jobs0) / n_runs, 1),
        }
        print(
            f"{name:36s} build {out[name]['build_s']:7.3f}  exec "
            f"{out[name]['exec_s']:7.3f}  jobs/run {out[name]['jobs_per_run']}",
            flush=True,
        )
        sc.setJobDescription(None)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "profile_out.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    tot_b = sum(v["build_s"] for v in out.values())
    tot_e = sum(v["exec_s"] for v in out.values())
    print(f"TOTAL build {tot_b:.1f}s exec {tot_e:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
