"""Single-pass table profiling (M-family: the ANALYZE/data-profile step).

Warehouse UIs and table-maintenance jobs publish per-column statistics —
null rate, distinct estimate, min/max — before anyone writes a query
(BigQuery data profiles, ANALYZE TABLE ... COMPUTE STATISTICS). The
Spark-first shape: ONE aggregation computes every column's stats in the
same scan (4 plain agg expressions per column — no per-row conditionals,
so none of the wide-pivot Catalyst cost documented in
quantization._probe_lut), then a stack() generator unpivots the 1-row
result to one row per column. One scan + a 1-row shuffle at any table
width/size; approx_count_distinct is the mergeable HLL so the profile is
shard-parallel for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, null_frac, approx_distinct,
    min_value, max_value) — one row per input column, computed in ONE
    aggregation pass. min/max render as strings so heterogeneous column
    types share a schema (complex types profile null min/max)."""
    cols = df.columns
    dtypes = dict(df.dtypes)

    def orderable(c: str) -> bool:
        # substring, not prefix: maps are unorderable wherever they NEST
        # (array<map<...>>, struct<...,m:map<...>>), not only at top level
        return "map<" not in dtypes[c]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(F.approx_count_distinct(F.col(c), rsd).alias(f"ad_{c}"))
        if orderable(c):
            aggs.append(F.min(F.col(c)).cast("string").alias(f"mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"mx_{c}"))
    one = df.agg(*aggs)

    stack_args = ", ".join(
        "'{c}', '{t}', nn_{c}, ad_{c}, {mn}, {mx}".format(
            c=c,
            t=dtypes[c],
            mn=f"mn_{c}" if orderable(c) else "CAST(NULL AS STRING)",
            mx=f"mx_{c}" if orderable(c) else "CAST(NULL AS STRING)",
        )
        for c in cols
    )
    return one.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, dtype, n_nonnull, approx_distinct, min_value, max_value)",
    ).select(
        "column",
        "dtype",
        "n_rows",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_nulls"),
        F.when(F.col("n_rows") > 0,
               (F.col("n_rows") - F.col("n_nonnull")) / F.col("n_rows"))
        .otherwise(F.lit(0.0)).alias("null_frac"),
        "approx_distinct",
        "min_value",
        "max_value",
    )
