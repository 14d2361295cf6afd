#!/usr/bin/env python
"""Interleaved same-window Spark/DuckDB A/B over the CPU-bound subset
(r12 VERDICT #4): settle the 1.01x→1.18x BENCH_VS_DUCK aggregate drift
between rounds with ONE measurement that box state cannot fake.

Method (the discipline scale_table_log.py already uses for its paired
MoR rows): for each query whose DuckDB reference median is >= 0.5 s
(the rows where the engines do comparable CPU work — everything else
measures Spark's fixed job floor), run N alternating (spark, duck)
pairs inside the same seconds-wide window and keep the MINIMUM per
engine: shared-VM contention only ever ADDS time, and interleaving
guarantees both engines saw the same box state. A ratio that moves
across rounds under this protocol is code, not weather.

Refuses to run when the box fails the bench's settle gate (load1 /
CPU steal), and records entry/exit steal in the output.

Run:  PYTHONPATH=. python tools/ab_interleaved.py
Prints a markdown table to append to BENCH_VS_DUCK.md.
"""

from __future__ import annotations

import os
import re
import sys
import time


N_PAIRS = int(os.environ.get("SPARK_GRAFT_AB_PAIRS", "5"))
DUCK_MIN_S = float(os.environ.get("SPARK_GRAFT_AB_DUCK_MIN", "0.5"))


def _ref_rows(path: str, sf_dir: str) -> dict[str, tuple[float, float]]:
    """{query: (spark_median, duck_median)} from BENCH_VS_DUCK.md's main
    table (the same anchor bench.py uses) — ONLY when the artifact was
    generated at the same sf dir (its header records it; r12 review:
    cross-scale medians would silently drive subset selection and the
    comparison column)."""
    out: dict[str, tuple[float, float]] = {}
    in_table = False
    with open(path) as f:
        if f"`{sf_dir}`" not in f.read(4096):
            return {}
        f.seek(0)
        for ln in f:
            if re.match(r"\|\s*query\s*\|\s*spark s\s*\|", ln):
                in_table = True
                continue
            if not in_table:
                continue
            m = re.match(
                r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|\s*([0-9.]+)\s*\|", ln
            )
            if m:
                out[m.group(1)] = (float(m.group(2)), float(m.group(3)))
            elif not ln.strip().startswith("|"):
                in_table = False
    return out


def main() -> None:
    import importlib.util

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(here, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    settle = bench._settle_wait(bench._SETTLE_LOAD1, 300)
    if settle.get("timed_out"):
        print(f"REFUSED: box never settled ({settle})", file=sys.stderr)
        sys.exit(1)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    refs = _ref_rows(os.path.join(here, "BENCH_VS_DUCK.md"), sf_dir)
    subset = sorted(n for n, (_s, d) in refs.items() if d >= DUCK_MIN_S)
    if not subset:
        print("no CPU-bound rows found (or BENCH_VS_DUCK.md was generated "
              f"at a different sf dir than {sf_dir})", file=sys.stderr)
        sys.exit(1)

    import gc

    import duckdb

    from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
    from open_data_lakehouse_demo_spark.session import get_spark

    spark = get_spark(app_name="ab-interleaved", cpus=cpus)
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={cpus}")
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    rows = []
    t_ab0 = time.time()
    for name in subset:
        q = QUERIES[name]
        # warm both engines untimed (JIT/codegen/caches = steady state)
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        con.execute(q.oracle).fetchall()
        s_min = d_min = float("inf")
        for _ in range(N_PAIRS):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            s_min = min(s_min, time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.execute(q.oracle).fetchall()
            d_min = min(d_min, time.perf_counter() - t0)
        gc.collect()
        ref_s, ref_d = refs[name]
        rows.append((name, s_min, d_min, ref_s / ref_d))
    exit_steal = bench._steal_now()

    print(f"\n### Interleaved A/B (r12): CPU-bound subset, duck ref >= "
          f"{DUCK_MIN_S}s\n")
    print(f"sf dir `{sf_dir}`, {cpus} threads, {N_PAIRS} alternating "
          f"(spark, duck) pairs per query in one window, MINIMUM kept per "
          f"engine (contention only adds time; interleaving gives both "
          f"engines the same box state). settle: entry_load1 "
          f"{settle['entry_load1']}, entry_steal {settle['entry_steal_pct']}%, "
          f"exit_steal {exit_steal}%; window {round(time.time() - t_ab0, 1)}s.\n")
    print("| query | spark min s | duck min s | A/B ratio | table ratio "
          "(5-run medians) |")
    print("|---|---|---|---|---|")
    agg_s = agg_d = 0.0
    for name, s, d, prev in sorted(rows, key=lambda r: -r[1]):
        agg_s += s
        agg_d += d
        print(f"| {name} | {s:.2f} | {d:.2f} | {s / d:.2f}× | {prev:.2f}× |")
    print(f"| **aggregate** | {agg_s:.2f} | {agg_d:.2f} | "
          f"{agg_s / agg_d:.2f}× | — |")
    spark.stop()


if __name__ == "__main__":
    main()
