"""Streaming continuous-aggregate rollups (batch-twin cross-validated).

The batch `daily_ohlc` query (plans/inventory_windows.py TS1) is the
rollup a lakehouse maintains incrementally under streaming ingestion; this
module is that incremental maintenance: the SAME struct-min/max open-close
aggregation expressed over an event-time window with a watermark, so each
finalized (type, day) bucket is emitted exactly once in append mode.

Cross-validation contract (tests/test_streaming.py): replaying a bounded
event set through the stream must produce byte-identical OHLC rows to the
batch query over the same rows — the struct(ts, event_id, value) total
order makes open/close deterministic in both executions regardless of
arrival order, which is precisely why the rollup uses a struct min instead
of first()/last() (arrival-order-dependent, unreproducible in a stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_ohlc(
    events: DataFrame,
    window_duration: str = "1 day",
    watermark: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Event-time OHLC rollup: (window_start, key, open/high/low/close, n).

    State per open window = one struct-min, one struct-max, two doubles
    and a count per (key, window) — constant-size mergeable state, the
    streaming analogue of the batch SortAggregate partials. Watermarked:
    finalized windows flush once (append mode); late rows beyond the
    watermark drop, exactly the lateness contract of the batch twin run
    at end-of-day.

    ``ts_col`` must be TIMESTAMP (LTZ) — Spark watermarks reject
    TIMESTAMP_NTZ; with the session tz pinned UTC (session.py) its wall
    times coincide with the batch twin's NTZ values.
    """
    key = F.struct(F.col(ts_col), F.col(id_col), F.col(value_col))
    agg = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"), key_col)
        .agg(
            F.min(key).alias("o"),
            F.max(value_col).alias("high_value"),
            F.min(value_col).alias("low_value"),
            F.max(key).alias("c"),
            F.count("*").alias("n_events"),
        )
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col(key_col).alias(key_col),
        F.col("o." + value_col).alias("open_value"),
        "high_value",
        "low_value",
        F.col("c." + value_col).alias("close_value"),
        "n_events",
    )
