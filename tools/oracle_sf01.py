#!/usr/bin/env python
"""t2 oracle sweep at sf0.1 for the HEAVIEST queries.

    PYTHONPATH=. python tools/oracle_sf01.py          # writes ORACLE_SF01.json
    PYTHONPATH=. python tools/oracle_sf01.py q1 q2    # explicit subset

The driver's hash gate runs at sf0.01 only (~500 docs / 60k lineitems),
which is blind to scale-dependent bug classes: integer overflow past a
threshold, df-cap cliffs in the inverted-index dedups, skew-sensitive
sampling, f32 accumulation drift over 10× the rows. This sweep runs the
same Spark-vs-DuckDB differential at sf0.1 for the top-N queries by
BENCH_VS_DUCK.md cost (the heavy ones are exactly where those bugs live)
and records ORACLE_SF01.json at the repo root; driver_sim --gate prints
it as an advisory. Refresh whenever a listed query's module changes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _oracle_hash import hash_rows as _hash_rows  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF_DIR = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
_TOP_N = 10


def _heaviest(osql: dict[str, str], n: int) -> list[str]:
    """Top-n oracle-checked queries by their BENCH_VS_DUCK.md Spark
    median (the honest cost ranking; registration order fallback)."""
    import re

    ref: dict[str, float] = {}
    try:
        with open(os.path.join(_REPO, "BENCH_VS_DUCK.md")) as f:
            for ln in f:
                m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|", ln)
                if m:
                    ref[m.group(1)] = float(m.group(2))
    except OSError:
        pass
    ranked = sorted(osql, key=lambda q: ref.get(q, 0.0), reverse=True)
    return ranked[:n]


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("oracle-sf01")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or _heaviest(
        osql, _TOP_N
    )
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{_SF_DIR}/{t}.parquet'")

    results: dict[str, dict] = {}
    for name in names:
        if name not in osql:
            print(f"{name}: no oracle — skipped")
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, _SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            cur = con.execute(osql[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            ok = (
                len(rows) == len(orows)
                and sorted(cols) == sorted(ocols)
                and _hash_rows(cols, rows) == _hash_rows(ocols, orows)
            )
            results[name] = {
                "hash_match": ok,
                "spark_rows": len(rows),
                "oracle_rows": len(orows),
                "secs": round(time.time() - t0, 2),
            }
            print(f"{name}: {'PASS' if ok else 'FAIL'} ({len(rows)}/{len(orows)})")
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            results[name] = {"hash_match": False, "err": f"{type(exc).__name__}: {exc}"}
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")

    # subset runs MERGE into the artifact (stamped per row) so a
    # targeted re-check after one module's change doesn't drop the rest
    path = os.path.join(_REPO, "ORACLE_SF01.json")
    merged: dict[str, dict] = {}
    try:
        merged = json.load(open(path)).get("queries", {})
    except (OSError, ValueError):
        pass
    stamp = int(time.time())
    for name, r in results.items():
        merged[name] = {**r, "checked_unix": stamp}
    out = {
        "sf_dir": _SF_DIR,
        "generated_unix": stamp,
        "queries": merged,
        "n_fail": sum(1 for r in merged.values() if not r.get("hash_match")),
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    n_fail_now = sum(1 for r in results.values() if not r.get("hash_match"))
    print(f"\n{len(results) - n_fail_now}/{len(results)} green this run "
          f"({out['n_fail']} failing in artifact) -> {path}")
    spark.stop()
    sys.exit(1 if out["n_fail"] else 0)


if __name__ == "__main__":
    main()
