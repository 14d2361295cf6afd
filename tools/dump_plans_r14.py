#!/usr/bin/env python
"""Dump .explain("formatted") for every inventory query into
plans/r14/<query>_<suffix>.txt (optimization-round evidence files).

Usage: PYTHONPATH=. python tools/dump_plans_r14.py before [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
    from open_data_lakehouse_demo_spark.session import get_spark

    spark = get_spark(app_name=f"plans-{suffix}", cpus=8)
    names = sys.argv[2:] or list(QUERIES)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name].spark(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print("ok", name, flush=True)
        except Exception as exc:  # keep going; report at the end
            print("FAIL", name, repr(exc)[:200], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
