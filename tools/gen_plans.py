#!/usr/bin/env python
"""Generate PLANS.md: formatted physical plans of flagship queries with the
properties each one must exhibit (pushdown, pruning, broadcast, top-k,
generator fan-out). Also ASSERTS those properties — run as a plan
regression check:
    PYTHONPATH=. python tools/gen_plans.py > PLANS.md
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
from open_data_lakehouse_demo_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"

# (query, required plan fragments, commentary)
CHECKS = [
    (
        "pricing_summary",
        ["PushedFilters: [IsNotNull(l_shipdate)", "HashAggregate"],
        "Filter pushed into the parquet scan; ReadSchema pruned to the 6 "
        "needed columns; partial HashAggregate map-side → one shuffle of "
        "group rows only.",
    ),
    (
        "order_features",
        ["BroadcastHashJoin", "PushedFilters"],
        "Star joins: the fact-fact join shuffles on orderkey, dimension "
        "joins broadcast; the l_extendedprice > 1000 filter reaches the scan.",
    ),
    (
        "top_orders",
        ["TakeOrderedAndProject"],
        "ORDER BY + LIMIT plans as per-partition top-k merge, not a total sort.",
    ),
    (
        "minute_fanout",
        ["Generate"],
        "The 60x fan-out is a Generate inside the scan stage — zero shuffle "
        "for the expansion itself.",
    ),
    (
        "demand_avg_recent",
        ["Subquery", "PushedFilters"],
        "The MAX(ts) anchor runs as a scalar subquery; the derived predicate "
        "then prunes at the main scan.",
    ),
    (
        "cosine_topk_bruteforce",
        ["BroadcastNestedLoopJoin"],
        "Probe batch broadcast against the streaming corpus (non-equi "
        "self-pair condition) — the corpus is never shuffled.",
    ),
    (
        "minhash_lsh_dups",
        ["SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", "HashAggregate"],
        "Band-key equi-join generates candidates (join strategy picked by "
        "AQE per input size); all hashing is JVM expressions; verification "
        "joins carry pre-sorted shingle arrays.",
    ),
    (
        "revenue_rollup_region_nation",
        ["Expand", "BroadcastHashJoin"],
        "ROLLUP plans as Expand + single aggregate pass; nation/region "
        "dimensions broadcast.",
    ),
]


def main() -> None:
    spark = get_spark(app_name="plans", cpus=8)
    print("# PLANS — physical-plan evidence for flagship queries\n")
    print("Generated (and property-asserted) by tools/gen_plans.py at sf0.01.\n")
    failures = []
    for name, fragments, commentary in CHECKS:
        df = QUERIES[name].spark(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # "a|b" fragments accept any alternative (AQE picks strategies by size)
        missing = [
            f for f in fragments if not any(alt in plan for alt in f.split("|"))
        ]
        if missing:
            failures.append((name, missing))
        status = "OK" if not missing else f"MISSING {missing}"
        print(f"## {name}  [{status}]\n")
        print(commentary + "\n")
        print("Required fragments: " + ", ".join(f"`{f}`" for f in fragments) + "\n")
        # keep the plan section readable: header + operator tree only
        tree = plan.split("\n\n")[0]
        print("```\n" + tree.strip() + "\n```\n")
    if failures:
        print(f"PLAN REGRESSIONS: {failures}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
