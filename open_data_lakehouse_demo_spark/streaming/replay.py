"""Replay producer (T6): history → timestamp-shifted envelope stream.

Re-expresses the reference's replay plane (webapp/buses-dashboard/
bq_service.py:52-86 + kafka_service.py:71-104): read a window of historical
rides, shift their timestamps so the window ends "now" (F3/F5 — the
reference rewrites the year inside the ride id with REGEXP_REPLACE and adds
an interval), serialize to the Kafka envelope JSON, and emit paced batches.
Offline, "paced emit" = one JSONL file per batch dropped into the streaming
source directory (the file source's maxFilesPerTrigger provides the pacing);
in production the same DataFrame goes to format("kafka").

The envelope mapping from the testdata ``events`` table is a deterministic
projection (event → bus update), so streaming tests have a reproducible
feed derived from driver fixtures rather than hand-built rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

N_BUS_LINES = 25


def events_as_bus_updates(events: DataFrame, shift_to: str | None = None) -> DataFrame:
    """Project the events table into bus-update envelopes (deterministic).

    Columns follow streaming.job.BUS_DATA_SCHEMA; ``shift_to`` (ISO ts)
    rebases event time so MAX(ts) lands there — the reference's
    shift-history-to-now trick, expressed as scalar-subquery arithmetic
    instead of string surgery on ids.
    """
    ts = F.col("ts")
    if shift_to is not None:
        max_ts = events.agg(F.max("ts").alias("m"))
        events = events.join(F.broadcast(max_ts)).withColumn(
            "ts", ts + (F.lit(shift_to).cast("timestamp") - F.col("m"))
        ).drop("m")
    line_id = (F.col("user_id") % N_BUS_LINES).cast("long")
    capacity = F.lit(60).cast("long")
    boarding = (F.col("value").cast("long") % 40).cast("long")
    in_stop = (boarding + (F.col("event_id") % 15)).cast("long")
    stop_index = (F.col("event_id") % 35).cast("int")
    return events.select(
        F.col("event_id").alias("id"),
        F.col("ts").alias("timestamp"),
        F.struct(
            F.concat_ws("_", F.lit("ride"), F.col("user_id"), F.col("event_id")).alias(
                "bus_ride_id"
            ),
            line_id.alias("bus_line_id"),
            F.concat(F.lit("line-"), line_id).alias("bus_line"),
            (F.col("event_id") % 431).cast("long").alias("bus_stop_id"),
            stop_index.alias("bus_stop_index"),
            F.col("ts").alias("timestamp_at_stop"),
            in_stop.alias("passengers_in_stop"),
            boarding.alias("passengers_boarding"),
            (in_stop - boarding).alias("remaining_at_stop"),
            boarding.alias("total_passengers"),
            capacity.alias("total_capacity"),
            (stop_index == 34).alias("last_stop"),
        ).alias("data"),
    )


def emission_schedule(
    updates: DataFrame, start_at: str, rate_per_sec: float = 1.0
) -> DataFrame:
    """T6 pacing contract: assign each envelope its producer emit time.

    The reference's replay producer sleeps 1s between sends
    (kafka_service.py:71-104) — a wall-clock behavior that can't be
    asserted offline without flaky sleep-based tests.  This expresses the
    SEMANTIC contract instead: the k-th envelope in (timestamp, id) order
    is emitted at ``start_at + k/rate`` seconds (rounded to timestamp
    precision, i.e. whole microseconds), so
      * emit order is the deterministic (timestamp, id) total order,
      * consecutive ``emit_at`` values differ by exactly 1/rate seconds
        whenever 1/rate is representable in whole microseconds (1.0, 2.0,
        0.5, …); for rates like 3.0 the per-step deltas alternate by 1 µs
        while the k/rate FORMULA — the actual invariant — stays exact.

    Scale note: the global row_number is a single-partition window, which
    is CORRECT here — the schedule is producer-sized (bounded by the
    replay window; even a day at 1 msg/s is 86k rows), never corpus-sized.
    """
    from pyspark.sql import Window

    w = Window.orderBy("timestamp", "id")
    rn = F.row_number().over(w) - F.lit(1)
    return updates.withColumn(
        "emit_at",
        F.lit(start_at).cast("timestamp")
        + F.make_interval(secs=rn.cast("double") / F.lit(float(rate_per_sec))),
    )


def replay_to_json_files(
    updates: DataFrame, out_dir: str, n_batches: int = 4
) -> list[str]:
    """Serialize envelopes to ``n_batches`` JSONL files (paced batches).

    Batching key = id mod n_batches (deterministic). Files are written
    atomically (tmp name → rename) so a concurrently-running file-source
    stream never reads partial batches. Returns the file paths in order —
    callers drop them into the source dir one at a time to simulate pacing.
    """
    os.makedirs(out_dir, exist_ok=True)
    # pmod keeps negative ids in [0, n); null ids can't be batched — drop
    # them like the old per-batch equality filter silently did
    json_rows = updates.filter(F.col("id").isNotNull()).select(
        F.pmod(F.col("id"), F.lit(n_batches)).alias("batch"),
        F.col("id"),
        F.to_json(F.struct("id", "timestamp", "data")).alias("line"),
    )
    # ONE pass: sort by (batch, id) and stream partitions through the
    # driver sequentially — the per-batch filter+collect loop it replaces
    # re-ran the whole upstream plan n_batches times. Driver-side emit is
    # the point (this IS the paced producer, mirroring the reference's
    # kafka_service.py:71-104 loop) and replay volume is bounded by the
    # replay window; the sort also makes file contents byte-deterministic.
    batches: dict[int, list[str]] = {b: [] for b in range(n_batches)}
    for r in json_rows.orderBy("batch", "id").toLocalIterator():
        batches[r["batch"]].append(r["line"])
    paths = []
    for b in range(n_batches):
        tmp = os.path.join(out_dir, f".batch_{b:04d}.jsonl.tmp")
        final = os.path.join(out_dir, f"batch_{b:04d}.jsonl")
        with open(tmp, "w") as f:
            f.write("\n".join(batches[b]) + "\n")
        os.rename(tmp, final)
        paths.append(final)
    return paths
