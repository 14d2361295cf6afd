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


def ntz_epoch_seconds(ts: Column) -> Column:
    """Wall-clock epoch seconds of a TIMESTAMP_NTZ via pure FIELD arithmetic.

    ``unix_timestamp``/``timestampdiff`` route NTZ values through the
    session timezone, which corrupts wall times that fall inside a DST
    spring-forward gap (02:30 on the transition day doesn't exist in
    America/New_York, so the round trip lands on 03:30). Date-diff plus
    intra-day fields never consults the timezone. Sub-seconds truncate.
    """
    day = F.datediff(ts.cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")
    sid = (F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)).cast("bigint")
    return day * 86400 + sid


def ntz_epoch_micros(ts: Column) -> Column:
    """Wall-clock epoch MICROSECONDS of a TIMESTAMP_NTZ — the µs-precision
    sibling of ntz_epoch_seconds (same pure field arithmetic, same DST-gap
    rationale; ``unix_micros`` rejects NTZ outright). Spark's extract has
    no MICROSECONDS field, but SECOND yields an exact DECIMAL(8,6)
    seconds-within-minute — × 1e6 in decimal space loses nothing."""
    day = F.datediff(ts.cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")
    min_us = (F.hour(ts) * 60 + F.minute(ts)).cast("bigint") * F.lit(60_000_000).cast(
        "bigint"
    )
    sub_us = (F.date_part(F.lit("SECOND"), ts) * 1_000_000).cast("bigint")
    return day * F.lit(86_400_000_000).cast("bigint") + min_us + sub_us


def timestamp_bucket(ts: Column | str, bucket_seconds: int) -> Column:
    """Floor a timestamp to a fixed-width bucket — GoogleSQL TIMESTAMP_BUCKET.

    Pure integer arithmetic on the wall-clock epoch (no UDF, no session-tz
    dependence — the driver's session may not pin UTC): survives codegen,
    and a join on the bucketed column stays a plain equi-join (SURVEY J6).
    LTZ inputs are first rendered as session-tz wall time (NTZ inputs are
    untouched). Returns TIMESTAMP_NTZ.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    epoch = ntz_epoch_seconds(ts.cast("timestamp_ntz"))
    floored = epoch - epoch % bucket_seconds
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz") + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), floored
    )


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


# Zone-free NTZ epoch seconds of an expression, as SQL text — the exact
# twin of ntz_epoch_seconds() above (field arithmetic, never the session
# zone). {x} must already be TIMESTAMP_NTZ.
_NTZ_EPOCH_SQL = (
    "(CAST(datediff(CAST({x} AS DATE), DATE '1970-01-01') AS BIGINT) * 86400"
    " + hour({x}) * 3600 + minute({x}) * 60 + second({x}))"
)


def _bucket_rewrite(m) -> str:
    x = f"CAST({m.group(1)} AS TIMESTAMP_NTZ)"
    e = _NTZ_EPOCH_SQL.format(x=x)
    width = f"({m.group(2)} * 60)"
    return (
        f"(TIMESTAMP_NTZ '1970-01-01 00:00:00'"
        f" + make_dt_interval(0, 0, 0, {e} - ({e} % {width})))"
    )


_GOOGLESQL_REWRITES: list[tuple[str, str]] = [
    # function-name renames (arg-shape compatible)
    (r"\bSAFE_DIVIDE\s*\(", "try_divide("),
    (r"\bGENERATE_ARRAY\s*\(", "sequence("),
    # NTZ-RESULT CONTRACT (r10): this twin stores timestamps as
    # TIMESTAMP_NTZ — tz-free UTC wall times (sources/io.py) — but
    # Spark's date_trunc/to_timestamp return the INSTANT type even for
    # NTZ input, silently re-interpreting wall times through the session
    # zone (a west-of-UTC driver session shifts every truncated value).
    # Rewrites whose GoogleSQL input is a table timestamp therefore pin
    # the result back to TIMESTAMP_NTZ; under the recommended UTC-pinned
    # session this is also exact for instant inputs.
    (r"\bTIMESTAMP_TRUNC\s*\(\s*([^,()]+)\s*,\s*(\w+)\s*\)",
     r"CAST(date_trunc('\2', \1) AS TIMESTAMP_NTZ)"),
    (r"\bTIMESTAMP_ADD\s*\(\s*(.+?)\s*,\s*INTERVAL\s+(\S+)\s+(\w+)\s*\)", r"(\1 + INTERVAL \2 \3)"),
    (r"\bTIMESTAMP_SUB\s*\(\s*(.+?)\s*,\s*INTERVAL\s+(\S+)\s+(\w+)\s*\)", r"(\1 - INTERVAL \2 \3)"),
    # zone-free field arithmetic mirroring timestamp_bucket() — the old
    # unix_timestamp() form routed NTZ through the session zone, which
    # mis-anchors buckets under offsets that aren't a multiple of the
    # bucket width (e.g. +12:45 with hour buckets)
    (r"\bTIMESTAMP_BUCKET\s*\(\s*(.+?)\s*,\s*INTERVAL\s+(\d+)\s+MINUTE\s*\)",
     _bucket_rewrite),
    (r"\bPARSE_TIMESTAMP\s*\(\s*'%m/%d/%Y %I:%M:%S %p'\s*,\s*(.+?)\s*\)",
     r"CAST(to_timestamp(\1, 'M/d/yyyy h:mm:ss a') AS TIMESTAMP_NTZ)"),
    (r"\bAPPROX_QUANTILES\s*\(\s*([^,()]+)\s*,\s*(\d+)\s*\)",
     r"percentile_approx(\1, (SELECT array_agg(CAST(i AS DOUBLE) / \2) FROM (SELECT explode(sequence(0, \2)) AS i)), 10000)"),
    # type-name renames
    (r"\bINT64\b", "BIGINT"),
    (r"\bFLOAT64\b", "DOUBLE"),
    (r"\bNUMERIC\b", "DECIMAL(38,9)"),
    # array index: arr[OFFSET(k)] is 0-based; element_at is 1-based
    (r"\[\s*OFFSET\s*\(\s*(\d+)\s*\)\s*\]", lambda m: f"[{m.group(1)}]"),
]


def translate_googlesql(sql: str) -> str:
    """Best-effort GoogleSQL → Spark SQL text translation (SURVEY §2.7 map).

    Covers the reference's actual function surface (the F1-F21 inventory);
    not a general dialect compiler. Output runs through ``spark.sql`` and is
    optimized by Catalyst like any native query. Spark's ``arr[k]`` is
    0-based like OFFSET, and EXTRACT(DAYOFWEEK) already matches GoogleSQL's
    1=Sunday, so those need no rewrite beyond syntax.
    """
    import re

    out = sql
    for pat, rep in _GOOGLESQL_REWRITES:
        out = re.sub(pat, rep, out, flags=re.IGNORECASE)
    return out


def register_sql_functions(spark: SparkSession) -> None:
    """Hook for session-level SQL function registration.

    Everything in the compat layer maps to Spark built-ins (no UDFs), so
    nothing needs registering; ported GoogleSQL text goes through
    ``translate_googlesql`` instead. Kept as an explicit no-op seam for
    future genuinely-custom SQL functions.
    """
    _ = spark
