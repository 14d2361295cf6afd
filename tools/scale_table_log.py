#!/usr/bin/env python
"""Measured scaling rows for the snapshot table format (SCALING.md
'## Table format' section — VERDICT r10 item #6): the three claims the
format's docstrings make as DESIGN properties, re-stated as numbers
across three decades of log size (1x/10x/30x snapshots ⇒ files ⇒ rows,
one coalesced file per append like a streaming sink produces):

  * STREAMING TAIL — "a micro-batch plans O(new files) partitions
    regardless of table size" (streaming/table_source.py:26): time the
    stream reader's offset poll + partition planning + worker read for
    ONE new append while the log behind it grows 30x.
  * MoR READ — read latency with accumulating deletion vectors vs the
    same table's plain read: the per-read anti-join tax MoR trades for
    kilobyte deletes (table_log.delete_rows_mor docstring) must stay a
    small additive cost, not a multiplier, as table and DV count grow.
  * METADATA COUNT(*) — count_rows answers from manifest row counts
    (DV-aware); cost is driver-side manifest JSON, growing with file
    COUNT only, never data.

Run on an idle box (the bench's settle/steal rules apply to any timing
artifact):  PYTHONPATH=. python tools/scale_table_log.py
Prints the markdown rows to paste into SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import statistics
import time


ROWS_PER_BATCH = 20_000
SCALES = [(1, 10), (10, 100), (30, 300)]  # (label multiplier, snapshots)


def _median(fn, n=5) -> float:
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    from pyspark.sql import functions as F

    from open_data_lakehouse_demo_spark.session import get_spark
    from open_data_lakehouse_demo_spark.sources import table_log as tl
    from open_data_lakehouse_demo_spark.streaming import table_source as ts

    spark = get_spark(
        app_name="scale-table-log",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    base = "/tmp/sg_scale_table_log"
    shutil.rmtree(base, ignore_errors=True)

    def batch(i: int):
        lo = i * ROWS_PER_BATCH
        return spark.range(lo, lo + ROWS_PER_BATCH).select(
            F.col("id"), (F.col("id") % 97).alias("k")
        ).coalesce(1)

    rows_tail = []
    rows_mor = []
    rows_count = []
    rows_cdf = []
    for mult, snaps in SCALES:
        path = os.path.join(base, f"t{mult}x")
        tl.create(spark, path, batch(0))
        for i in range(1, snaps):
            tl.append(spark, path, batch(i))

        # ---- streaming tail: ONE new append against a `snaps`-deep log
        latest = tl._list_snapshots(path)[-1]
        tl.append(spark, path, batch(snaps))
        from pyspark.sql import types as T
        import json as _json

        m = tl._read_manifest(path, latest + 1)
        schema = T.StructType.fromJson(_json.loads(m["schema"]))
        reader = ts._TableLogStreamReader(schema, {"path": path})

        def one_batch():
            end = reader.latestOffset()
            parts = reader.partitions({"snapshot": latest}, end)
            n = 0
            for p in parts:
                for b in reader.read(p):
                    n += b.num_rows
            assert n == ROWS_PER_BATCH, n
        rows_tail.append((mult, snaps + 1, _median(one_batch)))

        # ---- MoR read with accumulating deletion vectors (+1 DV per
        # delete commit, count scaled with the decade), vs plain read.
        # The box is a shared VM whose bursts only ever ADD time, so the
        # honest statistic is the MIN of interleaved runs (a burst that
        # lands on one side of a median pair fabricates a negative tax).
        n_dvs = 2 * mult
        pre_snap = tl._list_snapshots(path)[-1]
        for j in range(n_dvs):
            a = j * ROWS_PER_BATCH + 7
            tl.delete_rows_mor(
                spark, path, [("id", ">=", a), ("id", "<", a + 10)]
            )
        plain_ts, mor_ts = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            tl.read(spark, path, snapshot=pre_snap).count()
            plain_ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            tl.read(spark, path).count()
            mor_ts.append(time.perf_counter() - t0)
        rows_mor.append((mult, snaps + 1, n_dvs, min(plain_ts), min(mor_ts)))

        # ---- metadata COUNT(*): manifest-only, DV-aware
        expect = (snaps + 1) * ROWS_PER_BATCH - n_dvs * 10
        assert tl.count_rows(path) == expect
        rows_count.append((mult, snaps + 1, _median(
            lambda: tl.count_rows(path), n=5)))

        # ---- CDF feed: one append + one MoR delete at the END of a
        # log `snaps` deep — the incremental-consumer step. Cost claim:
        # O(new files + files the delta DVs touch), never table size.
        cdf_from = tl._list_snapshots(path)[-1]
        tl.append(spark, path, batch(snaps + 1))
        a = 3 * ROWS_PER_BATCH + 50_000  # hits one mid-table file
        tl.delete_rows_mor(spark, path, [("id", ">=", a), ("id", "<", a + 10)])

        def feed_step():
            df, _hw = tl.table_changes_feed(spark, path, cdf_from)
            n = df.count()
            assert n == ROWS_PER_BATCH + 10, n
        # record the TRUE log depth at measurement (review: snaps+2 is
        # the data-file count, not the snapshot count — the MoR delete
        # commits and the tail append are snapshots too)
        depth = len(tl._list_snapshots(path))
        rows_cdf.append((mult, depth, _median(feed_step, n=5)))

    print("\n## Table format (snapshots scale 1x/10x/30x; one file per append)\n")
    print("| face | 1x s | 10x s | 30x s | log depth 1x→30x |")
    print("|---|---|---|---|---|")
    t = {m: s for m, _n, s in rows_tail}
    print(f"| streaming tail: plan+read ONE micro-batch "
          f"(O(new files) claim, table_source.py:26) "
          f"| {t[1]:.3f} | {t[10]:.3f} | {t[30]:.3f} "
          f"| {rows_tail[0][1]}→{rows_tail[2][1]} snapshots |")
    c = {m: s for m, _n, s in rows_count}
    print(f"| metadata COUNT(*) (manifest row counts, DV-aware) "
          f"| {c[1]:.3f} | {c[10]:.3f} | {c[30]:.3f} "
          f"| {rows_count[0][1]}→{rows_count[2][1]} files |")
    f = {m: s for m, _n, s in rows_cdf}
    print(f"| CDF feed step: 1 append + 1 MoR delete at the log's end "
          f"(inserts + retractions; O(new files + touched DV files)) "
          f"| {f[1]:.3f} | {f[10]:.3f} | {f[30]:.3f} "
          f"| {rows_cdf[0][1]}→{rows_cdf[2][1]} snapshots |")
    print()
    print("| MoR read | files | DVs | plain read s | MoR read s | tax |")
    print("|---|---|---|---|---|---|")
    for mult, nf, ndv, plain, mor in rows_mor:
        print(f"| {mult}x | {nf} | {ndv} | {plain:.2f} | {mor:.2f} "
              f"| {mor - plain:+.2f}s |")
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
