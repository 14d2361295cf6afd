#!/usr/bin/env python
"""Interleaved A/B harness for session-config experiments (optimization
rounds, guide §1). Cross-session timings inside ONE JVM are confounded by
JIT warmth — later sessions always win — so each variant runs in its own
fresh subprocess and the variants alternate A,B,A,B,... in one window.
Per query we keep the MIN across same-variant subprocesses (contention
only adds time). Each subprocess warms the query once, then times
``n_runs`` noop-sink executions and reports the median.

Usage:
  PYTHONPATH=. python tools/ab_config.py \
      --conf-b '{"spark.sql.adaptive.coalescePartitions.minPartitionSize":"64k"}' \
      --queries containment_dups,ngram_jaccard_dups --pairs 3
A is the unmodified session (bench config); B adds the JSON overrides.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def _worker(conf_json: str, queries: list[str], n_runs: int) -> None:
    from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
    from open_data_lakehouse_demo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-worker", extra_conf=json.loads(conf_json) or None)
    out: dict[str, float] = {}
    for name in queries:
        q = QUERIES[name]
        spark.sparkContext.setJobDescription(f"ab:{name}")
        df = q.spark(spark, sf_dir)  # warm-up: session caches, scan listing
        df.write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(ts), 4)
    spark.stop()
    print("AB_RESULT " + json.dumps(out))


def main() -> None:
    if sys.argv[1:2] == ["--worker"]:
        _worker(sys.argv[2], sys.argv[3].split(","), int(sys.argv[4]))
        return
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf-a", default="{}")
    ap.add_argument("--conf-b", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    queries = args.queries.split(",")

    results: dict[str, dict[str, list[float]]] = {
        q: {"A": [], "B": []} for q in queries
    }
    for i in range(args.pairs):
        for label, conf in (("A", args.conf_a), ("B", args.conf_b)):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", conf,
                 args.queries, str(args.runs)],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                env={**os.environ, "PYTHONPATH": "."},
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("AB_RESULT ")]
            if not line:
                print(f"pair {i} {label} FAILED:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
                sys.exit(1)
            for q, s in json.loads(line[0][len("AB_RESULT "):]).items():
                results[q][label].append(s)
            print(f"pair {i} {label}: done", flush=True)

    print(f"\n{'query':36s} {'A(min)':>8s} {'B(min)':>8s} {'B/A':>6s}")
    for q in queries:
        a, b = min(results[q]["A"]), min(results[q]["B"])
        print(f"{q:36s} {a:8.3f} {b:8.3f} {b / a:6.2f}")
    print("\nraw:", json.dumps(results))


if __name__ == "__main__":
    main()
