"""End-to-end lakehouse pipeline: the reference demo's core flow
(stream → Iceberg table → query it; reference code/pyspark-job.py:205-216
foreachBatch table write, lakehouse_part2_spark_processing.py catalog setup)
re-expressed Spark-native over this repo's pieces:

    file-source stream → watermarked OHLC rollup (streaming/rollups.py)
      → exactly-once snapshot commits (sources/table_log.py)
      → OPTIMIZE compaction → time travel / audit
      → downstream batch read == the batch daily_ohlc twin

What this asserts that the unit tests don't: the PIECES COMPOSE — the
rollup's append-mode finalization drives one atomic snapshot per
micro-batch, the logged table's latest state is byte-identical to the
batch query over the same rows, and maintenance (compact) changes file
layout without changing query results."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.plans.inventory import QUERIES
from open_data_lakehouse_demo_spark.sources import table_log as tl
from open_data_lakehouse_demo_spark.sources.io import read_parquet
from open_data_lakehouse_demo_spark.streaming.rollups import windowed_ohlc

SF_DIR = "/root/testdata/sf0.01"


def test_stream_to_logged_table_to_batch_query(spark, tmp_path):
    events = read_parquet(spark, f"{SF_DIR}/events.parquet").select(
        "ts", "event_type", "event_id", "value"
    )
    bounds = events.agg(F.max(F.col("ts").cast("date")).alias("dmax")).collect()[0]
    kept = events.filter(F.col("ts").cast("date") < F.lit(bounds["dmax"]))

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = kept.select(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "event_type",
        "event_id",
        "value",
    ).collect()
    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps({"ts_s": r["ts_s"], "event_type": r["event_type"],
                                "event_id": r["event_id"], "value": r["value"]}) + "\n")

    schema = "ts_s string, event_type string, event_id bigint, value double"
    parsed = (
        spark.readStream.schema(schema).json(src)
        .select(
            F.to_timestamp(F.col("ts_s"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            "event_type", "event_id", "value",
        )
    )
    rollup = windowed_ohlc(parsed, "1 day", "1 hour")

    table = str(tmp_path / "ohlc_table")
    tl.create(spark, table, rollup.sparkSession.createDataFrame([], rollup.schema))
    sink = tl.foreach_batch_appender(table, "ohlc-rollup")
    q = (
        rollup.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        snaps_mid = len(tl.history(table)) - 1  # appends so far
        # late sentinel pushes the watermark past every kept window
        with open(os.path.join(src, "b2.jsonl"), "w") as f:
            f.write(json.dumps({
                "ts_s": f"{bounds['dmax'].isoformat()} 23:59:59.000000",
                "event_type": "view", "event_id": -1, "value": 0.0,
            }) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()

    # one atomic snapshot per micro-batch, all tagged by the writer
    hist = tl.history(table)
    assert hist[0]["operation"] == "create"
    assert all(h["operation"] == "append" for h in hist[1:])
    assert len(hist) - 1 > snaps_mid  # the sentinel batch committed too

    # the logged table's latest state == the batch twin over the same rows
    from tests.conftest import utc_naive

    def key(r):
        # window_start is an INSTANT (watermarks need LTZ): invert the
        # Python-local rendering back to the session's UTC wall before
        # taking the calendar day (broke under TZ=America/New_York)
        d = utc_naive(r[0]) if hasattr(r[0], "date") else r[0]
        return (d.date().isoformat() if hasattr(d, "date") else d.isoformat(), r[1])

    got = {
        key((r["window_start"], r["event_type"])): (
            r["open_value"], r["high_value"], r["low_value"], r["close_value"], r["n_events"])
        for r in tl.read(spark, table).collect()
    }
    want = {
        (r["day"].isoformat(), r["event_type"]): (
            r["open_value"], r["high_value"], r["low_value"], r["close_value"], r["n_events"])
        for r in QUERIES["daily_ohlc"].spark(spark, SF_DIR).collect()
        if r["day"] < bounds["dmax"]
    }
    assert got == want and len(got) > 0

    # time travel: the mid-stream snapshot holds a strict subset
    mid = tl.read(spark, table, snapshot=snaps_mid).count()
    assert 0 <= mid < len(got)

    # OPTIMIZE: compaction changes layout, not results
    n_files_before = len(tl._read_manifest(table, len(hist) - 1)["files"])
    s = tl.compact(spark, table, target_files=1)
    assert len(tl._read_manifest(table, s)["files"]) <= n_files_before
    got2 = {
        key((r["window_start"], r["event_type"])): (
            r["open_value"], r["high_value"], r["low_value"], r["close_value"], r["n_events"])
        for r in tl.read(spark, table).collect()
    }
    assert got2 == want
