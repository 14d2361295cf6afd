"""Z-order clustered layout: Morton key correctness, write shape, and the
file-skipping ratios the layout exists to buy (sources/layout.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.sources import layout
from open_data_lakehouse_demo_spark.sources.io import read_parquet
from tests.conftest import SF_DIR


def _morton_ref(vals: list[int], bits: int) -> int:
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(200)]
    df = spark.createDataFrame(rows, "i INT, a INT, b INT")
    got = df.select(
        "a", "b", layout._interleave([F.col("a"), F.col("b")], 8).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref([r["a"], r["b"]], 8)


def test_minmax_norm_bounds_and_clamp(spark):
    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,)], "x DOUBLE")
    got = sorted(
        r[0] for r in df.select(layout._minmax_norm(F.col("x"), 0.0, 10.0, 8)).collect()
    )
    assert got[0] == 0 and got[-1] == 255 and 0 <= got[1] <= 255
    # constant column -> all zero, no divide-by-zero
    const = df.select(layout._minmax_norm(F.col("x"), 3.0, 3.0, 8).alias("n"))
    assert [r["n"] for r in const.collect()] == [0, 0, 0]


def test_quantile_norm_is_rank_uniform_under_skew(spark):
    # heavy tail: minmax would collapse 99% of rows into bucket 0
    rows = [(float(i),) for i in range(990)] + [(1e9 + i,) for i in range(10)]
    df = spark.createDataFrame(rows, "x DOUBLE")
    k = layout.zorder_key(df, ["x"], bits=4, normalize="quantile")
    buckets = df.select(k.alias("z")).groupBy("z").count().collect()
    # 16 buckets, none holding more than ~2x the uniform share
    assert len(buckets) >= 12
    assert max(r["count"] for r in buckets) <= 2 * (1000 // 16) + 5


def test_write_zordered_roundtrip_and_file_count(spark, tmp_path):
    orders = read_parquet(spark, f"{SF_DIR}/orders.parquet")
    dest = str(tmp_path / "z")
    layout.write_zordered(
        orders, dest, ["o_custkey", "o_totalprice"], n_files=8
    )
    back = spark.read.parquet(dest)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)  # transient key dropped
    stats = layout.file_minmax(dest, "o_custkey")
    assert 1 <= len(stats) <= 8


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    """The claim the layout pays for: after z-ordering on (custkey,
    totalprice), a BETWEEN predicate on EITHER column overlaps only a
    band of files, while a single-column sort prunes only its own column
    and reads 100% of files for the other."""
    orders = read_parquet(spark, f"{SF_DIR}/orders.parquet")
    n_files = 16
    zdest = str(tmp_path / "zord")
    ldest = str(tmp_path / "linear")
    # RangePartitioner SAMPLES split boundaries with an RDD-id-derived
    # seed: at the default 100 samples/partition a marginal boundary
    # occasionally widens one file enough to drop a skip ratio below
    # threshold (observed once in a full-suite run, never solo). Dense
    # sampling makes the boundaries effectively exact and the ratios
    # reproducible; production writes keep the cheap default — balance,
    # not exact boundaries, is what matters at scale.
    prev = spark.conf.get("spark.sql.execution.rangeExchange.sampleSizePerPartition", "100")
    spark.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", "5000")
    try:
        layout.write_zordered(
            orders, zdest, ["o_custkey", "o_totalprice"], n_files=n_files
        )
        # control: classic single-axis clustering (S15) on custkey only
        (
            orders.repartitionByRange(n_files, "o_custkey")
            .sortWithinPartitions("o_custkey")
            .write.mode("overwrite")
            .parquet(ldest)
        )
    finally:
        spark.conf.set("spark.sql.execution.rangeExchange.sampleSizePerPartition", prev)

    row = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()
    ck_lo, ck_hi, tp_lo, tp_hi = (float(x) for x in row)
    # a 10%-selectivity box on each dimension, mid-range
    ck_a = ck_lo + 0.45 * (ck_hi - ck_lo)
    ck_b = ck_lo + 0.55 * (ck_hi - ck_lo)
    tp_a = tp_lo + 0.45 * (tp_hi - tp_lo)
    tp_b = tp_lo + 0.55 * (tp_hi - tp_lo)

    z_ck = layout.skip_ratio(zdest, "o_custkey", ck_a, ck_b)
    z_tp = layout.skip_ratio(zdest, "o_totalprice", tp_a, tp_b)
    l_ck = layout.skip_ratio(ldest, "o_custkey", ck_a, ck_b)
    l_tp = layout.skip_ratio(ldest, "o_totalprice", tp_a, tp_b)

    # single-axis sort: excellent on its own column, useless on the other
    assert l_ck >= 0.75
    assert l_tp == 0.0
    # z-order: a real skip on BOTH columns (bit-interleave halves
    # resolution per column, so it won't beat the dedicated sort on
    # custkey — it must beat NO layout on totalprice by a wide margin)
    assert z_ck >= 0.25, f"z-order custkey skip too weak: {z_ck}"
    assert z_tp >= 0.25, f"z-order totalprice skip too weak: {z_tp}"

    # pruning is CORRECT: files declared skippable contain no matching rows
    stats = layout.file_minmax(zdest, "o_totalprice")
    touched = set(layout.overlapping_files(stats, tp_a, tp_b))
    full = spark.read.parquet(zdest).filter(
        F.col("o_totalprice").between(tp_a, tp_b)
    )
    files_with_hits = {
        r["f"].rsplit("/", 1)[-1]
        for r in full.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert files_with_hits <= touched


def test_zorder_key_rejects_bad_args(spark):
    df = spark.createDataFrame([(1.0,)], "x DOUBLE")
    with pytest.raises(ValueError):
        layout.zorder_key(df, [])
    with pytest.raises(ValueError):
        layout.zorder_key(df, ["x"], normalize="rank")
