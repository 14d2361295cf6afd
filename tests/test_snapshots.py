"""Snapshot-table time travel: versioning, append-by-reference, as-of reads,
expiry, and commit atomicity."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.sources import snapshots as sn


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 10).alias("v"))


def test_versioned_writes_and_time_travel(spark, tdir):
    v1 = sn.write_snapshot(_df(spark, 0, 100), tdir)
    v2 = sn.write_snapshot(_df(spark, 100, 150), tdir, mode="append")
    v3 = sn.write_snapshot(_df(spark, 0, 10), tdir, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)

    assert sn.read_snapshot(spark, tdir).count() == 10  # latest = v3
    assert sn.read_snapshot(spark, tdir, version=1).count() == 100
    assert sn.read_snapshot(spark, tdir, version=2).count() == 150
    assert sn.current_version(tdir) == 3

    log = sn.snapshots(tdir)
    assert [s["operation"] for s in log] == ["overwrite", "append", "overwrite"]
    assert [s["parent"] for s in log] == [None, 1, 2]


def test_append_reuses_parent_segments(spark, tdir):
    sn.write_snapshot(_df(spark, 0, 1000), tdir)
    files_v1 = set(glob.glob(f"{tdir}/data/*/part-*.parquet"))
    sn.write_snapshot(_df(spark, 1000, 1100), tdir, mode="append")
    # v1's files are untouched (referenced, not rewritten)
    assert files_v1 <= set(glob.glob(f"{tdir}/data/*/part-*.parquet"))
    m1, m2 = sn.snapshots(tdir)
    assert m1["segments"][0] in m2["segments"]
    assert len(m2["segments"]) == 2


def test_as_of_timestamp_resolution(spark, tdir):
    sn.write_snapshot(_df(spark, 0, 5), tdir)
    t_after_v1 = sn.snapshots(tdir)[-1]["committed_at"]
    sn.write_snapshot(_df(spark, 0, 50), tdir)
    assert sn.read_snapshot(spark, tdir, as_of_timestamp=t_after_v1).count() == 5
    with pytest.raises(ValueError, match="no snapshot"):
        sn.read_snapshot(spark, tdir, as_of_timestamp=t_after_v1 - 1e6)


def test_expire_snapshots_keeps_live_segments(spark, tdir):
    sn.write_snapshot(_df(spark, 0, 10), tdir)
    sn.write_snapshot(_df(spark, 10, 20), tdir, mode="append")
    sn.write_snapshot(_df(spark, 0, 3), tdir, mode="overwrite")
    expired = sn.expire_snapshots(tdir, keep_last=2)
    assert expired == [1]
    # v2 still readable (its segments include v1's, which must survive)
    assert sn.read_snapshot(spark, tdir, version=2).count() == 20
    assert sn.read_snapshot(spark, tdir).count() == 3
    with pytest.raises(FileNotFoundError):
        sn.read_snapshot(spark, tdir, version=1)


def test_unreferenced_segments_invisible_to_readers(spark, tdir):
    """Commit protocol: data written without a manifest never surfaces."""
    sn.write_snapshot(_df(spark, 0, 10), tdir)
    # simulate a crashed writer: segment exists, no manifest references it
    _df(spark, 0, 999).write.parquet(os.path.join(tdir, "data/v99999-dead"))
    assert sn.read_snapshot(spark, tdir).count() == 10
    assert sn.current_version(tdir) == 1
