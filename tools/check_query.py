#!/usr/bin/env python
"""Spot-check named inventory queries: DuckDB-oracle compare at sf0.01
(rows + schema-width + order-insensitive value hash, mirroring the
driver's gate) and warm-median timing at sf0.1.

    PYTHONPATH=. python tools/check_query.py ann_recall_sweep [more...]
    PYTHONPATH=. python tools/check_query.py --time-only q1 q2
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _oracle_hash import hash_rows as _hash_rows  # noqa: E402


def _canon_lines(cols, rows) -> list[str]:
    from _oracle_hash import canon

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(canon(r[i]) for i in order) for r in rows)


def _dump_diff(name, cols, rows, ocols, orows, limit: int = 5) -> None:
    """On a hash mismatch, persist both sides' sorted canonical lines
    under /tmp and print the first `limit` lines unique to each side."""
    sl, ol = _canon_lines(cols, rows), _canon_lines(ocols, orows)
    sp, op_ = f"/tmp/{name}.spark.rows", f"/tmp/{name}.oracle.rows"
    with open(sp, "w") as f:
        f.write("\n".join(sl))
    with open(op_, "w") as f:
        f.write("\n".join(ol))
    only_s = sorted(set(sl) - set(ol))
    only_o = sorted(set(ol) - set(sl))
    print(f"  diff dump: {sp} / {op_} "
          f"(spark-only {len(only_s)}, oracle-only {len(only_o)})")
    for tag, lines in (("spark-only", only_s), ("oracle-only", only_o)):
        for ln in lines[:limit]:
            show = ln if len(ln) <= 200 else ln[:200] + "..."
            print(f"    {tag}: {show!r}")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    time_only = "--time-only" in sys.argv
    check_only = "--check-only" in sys.argv
    sf001 = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    import duckdb

    from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
    from open_data_lakehouse_demo_spark.session import get_spark

    spark = get_spark(
        app_name="check-query",
        cpus=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={cpus}")
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf001}/{t}.parquet'")

    for name in names:
        q = QUERIES[name]
        if not time_only:
            df = q.spark(spark, sf001)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            if q.oracle is None:
                print(f"{name}: rows-only, spark_rows={len(rows)}")
            else:
                cur = con.execute(q.oracle)
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
                sh, oh = _hash_rows(cols, rows), _hash_rows(ocols, orows)
                ok = (len(rows) == len(orows)
                      and sorted(cols) == sorted(ocols) and sh == oh)
                print(f"{name}: rows {len(rows)}/{len(orows)} "
                      f"schema {sorted(cols) == sorted(ocols)} "
                      f"hash {sh == oh} -> {'PASS' if ok else 'FAIL'}")
                if sorted(cols) != sorted(ocols):
                    print(f"  spark cols: {sorted(cols)}")
                    print(f"  duck  cols: {sorted(ocols)}")
                if sh != oh:
                    # row-level diff dump (VERDICT r7 #1): write both
                    # sides' sorted canonical lines and print the first
                    # divergences, so a hash mismatch names the rows
                    # instead of leaving them to inference.
                    _dump_diff(name, cols, rows, ocols, orows)
        if not check_only:
            import gc

            q.spark(spark, sf01).write.format("noop").mode("overwrite").save()
            ts = []
            for _ in range(n_runs):
                gc.collect()  # release dropped plans' checkpoint blocks (bench.py policy)
                t0 = time.perf_counter()
                q.spark(spark, sf01).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            print(f"{name}: median {statistics.median(ts):.2f}s "
                  f"(runs {[round(x, 2) for x in ts]}) at {sf01}")
    spark.stop()


if __name__ == "__main__":
    main()
