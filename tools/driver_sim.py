#!/usr/bin/env python
"""Full driver-contract dry run: every queries() entry vs its oracle_sql()
under a PLAIN SparkSession (no UTC pin, no AQE/Arrow tuning) — exactly the
environment the external driver supplies. Run with a hostile zone to catch
timezone-sensitive paths before the driver does:

    TZ=America/New_York PYTHONPATH=. python tools/driver_sim.py

Prints one line per query (PASS/FAIL/rows-only) + a failure summary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _oracle_hash import hash_rows as _hash_rows  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    print("entry rows:", len(e.entry(spark).collect()))
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            if name not in osql:
                print(f"{name}: rows-only ({len(rows)} rows)")
                continue
            cur = con.execute(osql[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            ok = (
                len(rows) == len(orows)
                and sorted(cols) == sorted(ocols)
                and _hash_rows(cols, rows) == _hash_rows(ocols, orows)
            )
            print(f"{name}: {'PASS' if ok else 'FAIL'} ({len(rows)}/{len(orows)})")
            if not ok:
                failures.append(name)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            failures.append(name)
    print(f"\n{len(qs) - len(failures)}/{len(qs)} green; failures: {failures or 'none'}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
