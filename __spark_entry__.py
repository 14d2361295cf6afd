"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``open_data_lakehouse_demo_spark``; this module is
a thin adapter over the named query inventory (plans/inventory.py).
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _inventory():
    from open_data_lakehouse_demo_spark.plans.inventory import QUERIES

    return QUERIES


# The driver's correctness artifact records at most ~50 queries in
# registration order, so with more queries than slots the coverage must
# ROTATE: every query needs a row in the union of the two most recent
# artifacts. Round 5 shipped with the rotation not executed (the #1
# verdict finding); since r6 the rotation is SELF-MAINTAINING — queries
# are ordered stalest-first from the CORRECTNESS_r*.json artifacts
# themselves, so whichever 50 the driver records is always the set that
# most needs fresh evidence, with no per-round list editing to forget:
#
#   1. _FORCE_FRESH (small, hand-curated per round): queries whose
#      implementation changed this round — they need re-verification
#      even if their last row is recent. r6: bpe_merges (at-scale local
#      learner), ann_recall_eval (shared-arm cache, applicationId key),
#      sq_int8_topk (bit-parity Arrow kernel, then the collect-free
#      declarative stats subplan), the k-means pair (one shared
#      assignment pass — the r5 perf regression's root cause) and
#      bloom_decontaminate (both arms fused into one corpus scan).
#   2. never-recorded queries (no row in ANY artifact) — newest
#      registrations surface automatically;
#   3. everything else by ascending last-recorded round (stalest
#      first), registration order as the deterministic tiebreak.
#
# tools/driver_sim.py --gate independently asserts the resulting
# 2-round-union coverage before every snapshot.
_FORCE_FRESH = [
    "bpe_merges",
    "ann_recall_eval",
    "sq_int8_topk",
    "cosine_topk_ivf_kmeans",
    "cosine_topk_ivf_kmeans1",
    "bloom_decontaminate",
]

_REPO = os.path.dirname(os.path.abspath(__file__))


def _staleness_order(names: list[str]) -> list[str]:
    """names sorted stalest-first by the correctness artifacts on disk
    (registration order when none exist — e.g. a fresh checkout)."""
    last_seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name in rows:
            last_seen[name] = max(last_seen.get(name, -1), rnd)
    pos = {n: i for i, n in enumerate(names)}
    forced = [n for n in _FORCE_FRESH if n in pos]
    rest = sorted(
        (n for n in names if n not in set(forced)),
        key=lambda n: (last_seen.get(n, -1), pos[n]),
    )
    return forced + rest


def _ordered():
    inv = _inventory()
    return {n: inv[n] for n in _staleness_order(list(inv))}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    queries = _inventory()
    return queries["pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only check)."""
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
