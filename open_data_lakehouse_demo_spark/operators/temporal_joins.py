"""Temporal joins Spark lacks as builtins: as-of join and range join.

Neither appears in the reference (SURVEY §2.3 notes their absence), but
they're core time-series lakehouse operators, so the engine provides them
Spark-first as compositions of built-in operators — no UDFs, no
cross joins:

AS-OF JOIN (match each left row to the latest right row at-or-before its
timestamp, per key) — the classic scalable formulation is the union-window
trick:
    tag both sides → union → one window sort per (key) over (ts, side) →
    last non-null right-payload carried forward → keep left rows.
  ONE shuffle + ONE per-key sort total, regardless of how many right rows
  precede each left row. The naive alternative (theta join + groupBy max)
  is quadratic per key; this is the formulation used by production
  time-series stores.

RANGE JOIN (equi-key + left.ts ∈ [right.start, right.end]) — bucketize
time into fixed-width buckets; an interval overlaps a bucket iff it spans
it, so exploding each right interval over the buckets it covers turns the
range predicate into an equi-join on (key, bucket) followed by the exact
range filter. Bucket width trades replication factor against candidate
fan-in (pick ≈ median interval width); skew-safe because hot buckets
split across AQE partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance_seconds: int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: latest right row with right_ts ≤ left_ts per key.

    Left rows with no prior right row (or outside ``tolerance_seconds``)
    keep NULL right columns. Right payload columns are prefixed. Ties on
    right_ts resolve to the LAST right row in (ts, original column order)
    — deterministic given distinct right rows.
    """
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{right_prefix}{c}") for c in rcols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l_row"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols],
        F.col(right_ts).alias("__r_ts"),
        F.lit(None).cast(l_tagged.schema["__l_row"].dataType).alias("__l_row"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (side 0) sort before left rows at equal ts ⇒ "at-or-before"
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{right_prefix}{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in rcols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__c_ts"),
    ).filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        from open_data_lakehouse_demo_spark.functions.compat import ntz_epoch_seconds

        # tz-free timestamp difference (driver sessions may not pin UTC)
        in_tol = F.col("__c_ts").isNotNull() & (
            ntz_epoch_seconds(F.col("__ts").cast("timestamp_ntz"))
            - ntz_epoch_seconds(F.col("__c_ts").cast("timestamp_ntz"))
            <= tolerance_seconds
        )
        carried = carried.select(
            "*",
            *[F.when(in_tol, F.col(f"__c_{c}")).alias(f"__t_{c}") for c in rcols],
            F.when(in_tol, F.col("__c_ts")).alias("__t_ts"),
        )
        out_cols = [F.col(f"__t_{c}").alias(f"{right_prefix}{c}") for c in rcols]
        matched_ts = F.col("__t_ts").alias(f"{right_prefix}{right_ts}")
    else:
        out_cols = [F.col(f"__c_{c}").alias(f"{right_prefix}{c}") for c in rcols]
        matched_ts = F.col("__c_ts").alias(f"{right_prefix}{right_ts}")
    return carried.select(F.col("__l_row.*"), matched_ts, *out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    range_start: str,
    range_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner range join: rows where keys match and left_ts ∈ [start, end].

    Bucketized equi-join prefilter (see module docstring) + exact range
    predicate. End-inclusive. Returns left columns + right columns minus
    the key columns (which would duplicate).
    """
    from open_data_lakehouse_demo_spark.functions.compat import ntz_epoch_seconds

    l_b = left.withColumn(
        "__bucket",
        (ntz_epoch_seconds(F.col(left_ts).cast("timestamp_ntz")) / bucket_seconds)
        .cast("long"),
    )
    r_epochs = right.withColumn(
        "__b0", (ntz_epoch_seconds(F.col(range_start).cast("timestamp_ntz")) / bucket_seconds).cast("long")
    ).withColumn(
        "__b1", (ntz_epoch_seconds(F.col(range_end).cast("timestamp_ntz")) / bucket_seconds).cast("long")
    )
    r_b = r_epochs.withColumn(
        "__bucket", F.explode(F.sequence(F.col("__b0"), F.col("__b1")))
    ).drop("__b0", "__b1")
    joined = l_b.join(r_b, [*on, "__bucket"]).filter(
        (F.col(left_ts) >= F.col(range_start)) & (F.col(left_ts) <= F.col(range_end))
    )
    return joined.drop("__bucket")
