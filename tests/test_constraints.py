"""CHECK / NOT NULL constraints on logged tables (sources/table_log.py
add_constraint/drop_constraint + _enforce_constraints): Delta-style
table constraints validated footer-stats-FIRST — a file whose recorded
bounds prove the predicate is never opened; only unproven files get a
single-column pyarrow scan. SQL CHECK semantics: NULL passes a
comparison, NOT NULL is its own constraint kind.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.sources import table_log as tl


def _df(spark, rows, ddl="id long, v int"):
    return spark.createDataFrame(rows, ddl).coalesce(1)


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "t")
    tl.create(spark, path, _df(spark, [(1, 10), (2, 20)]))
    return path


def test_add_constraint_validates_existing_data(spark, tbl):
    tl.add_constraint(tbl, "v_pos", "v", ">=", 0)
    assert tl._read_manifest(tbl, tl._list_snapshots(tbl)[-1])["constraints"] == {
        "v_pos": ["v", ">=", 0]
    }
    with pytest.raises(ValueError, match="violated by 1 row"):
        tl.add_constraint(tbl, "v_big", "v", ">", 15)  # v=10 violates
    with pytest.raises(ValueError, match="already exists"):
        tl.add_constraint(tbl, "v_pos", "v", ">=", 1)
    with pytest.raises(ValueError, match="no column"):
        tl.add_constraint(tbl, "x_pos", "x", ">=", 0)


def test_appends_enforce_and_null_passes_check(spark, tbl):
    tl.add_constraint(tbl, "v_pos", "v", ">=", 0)
    tl.append(spark, tbl, _df(spark, [(3, 30)]))
    # SQL CHECK: NULL passes a comparison constraint
    tl.append(spark, tbl, _df(spark, [(4, None)]))
    assert tl.read(spark, tbl).count() == 4
    with pytest.raises(ValueError, match="v_pos.*violated"):
        tl.append(spark, tbl, _df(spark, [(5, -1)]))
    assert tl.read(spark, tbl).count() == 4  # nothing committed
    # overwrite and merge enforce too (the other new-row ops)
    with pytest.raises(ValueError, match="violated"):
        tl.overwrite(spark, tbl, _df(spark, [(9, -9)]))
    with pytest.raises(ValueError, match="violated"):
        tl.merge(spark, tbl, _df(spark, [(1, -5)]), on=["id"])
    # drop lifts the rule
    tl.drop_constraint(tbl, "v_pos")
    tl.append(spark, tbl, _df(spark, [(5, -1)]))
    assert tl.read(spark, tbl).count() == 5


def test_not_null_constraint(spark, tbl):
    with pytest.raises(ValueError, match="violated"):
        # existing data check: add a null first
        tl.append(spark, tbl, _df(spark, [(3, None)]))
        tl.add_constraint(tbl, "v_nn", "v", "not_null")
    tl.delete_rows(spark, tbl, [("id", "=", 3)])
    tl.add_constraint(tbl, "v_nn", "v", "not_null")
    with pytest.raises(ValueError, match="v_nn.*violated by 1 row"):
        tl.append(spark, tbl, _df(spark, [(6, None)]))
    tl.append(spark, tbl, _df(spark, [(6, 60)]))
    assert tl.read(spark, tbl).where("v is null").count() == 0


def test_stats_prove_skips_file_opens(spark, tbl, monkeypatch):
    """The 100 TB shape: a compliant append is validated from its
    recorded footer bounds alone — no data file is opened."""
    tl.add_constraint(tbl, "v_pos", "v", ">=", 0)
    opened = []
    real = tl._scan_violations

    def spy(path, rel, cols, spec):
        opened.append(rel)
        return real(path, rel, cols, spec)

    monkeypatch.setattr(tl, "_scan_violations", spy)
    tl.append(spark, tbl, _df(spark, [(7, 70), (8, 80)]))
    assert opened == []  # proven by bounds, zero scans
    # a mixed file (bounds straddle) falls back to exactly one scan —
    # and passes, because the straddling row is NULL (CHECK passes NULL)
    tl.append(spark, tbl, _df(spark, [(9, None), (10, 100)]))
    assert len(opened) <= 1


def test_constraints_follow_rename_and_block_drop(spark, tbl):
    tl.add_constraint(tbl, "v_pos", "v", ">=", 0)
    with pytest.raises(ValueError, match="bound by constraint"):
        tl.drop_column(tbl, "v")
    tl.rename_column(tbl, "v", "value")
    m = tl._read_manifest(tbl, tl._list_snapshots(tbl)[-1])
    assert m["constraints"]["v_pos"] == ["value", ">=", 0]
    # enforcement still works across the rename (old files' stats carry
    # the old physical name; the check binds through _phys_names)
    with pytest.raises(ValueError, match="violated"):
        tl.append(
            spark, tbl,
            spark.createDataFrame([(9, -1)], "id long, value int").coalesce(1),
        )
    tl.append(
        spark, tbl,
        spark.createDataFrame([(9, 90)], "id long, value int").coalesce(1),
    )
    assert tl.read(spark, tbl).count() == 3


def test_add_constraint_refuses_live_deletion_vectors(spark, tbl):
    tl.delete_rows_mor(spark, tbl, [("v", "=", 10)])
    with pytest.raises(ValueError, match="deletion vectors"):
        tl.add_constraint(tbl, "v_big", "v", ">=", 15)
    tl.compact(spark, tbl)
    tl.add_constraint(tbl, "v_big", "v", ">=", 15)  # survivor v=20 passes


def test_writer_paths_enforce_constraints(spark, tbl, tmp_path):
    """The data-source writers flow through the same choke point."""
    from open_data_lakehouse_demo_spark.streaming import table_source as ts

    ts.register(spark)
    tl.add_constraint(tbl, "v_pos", "v", ">=", 0)
    with pytest.raises(Exception, match="violated"):
        (
            _df(spark, [(11, -11)]).write.format("table_log")
            .option("path", tbl).mode("append").save()
        )
    _df(spark, [(11, 11)]).write.format("table_log").option(
        "path", tbl
    ).mode("append").save()
    assert tl.read(spark, tbl).where("id = 11").count() == 1


def test_partition_column_constraints_enforced(spark, tmp_path):
    """Regression (r10 review): partition columns live in the hive path,
    not the data files, so a scan fallback would silently miss their
    violations — they must decide from the exact [v, v] partition stats
    (zero file opens either way)."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10, 1)], "id long, v int, pt int")
    tl.create(spark, path, df, partition_by=["pt"])
    tl.add_constraint(path, "pt_pos", "pt", ">=", 1)
    tl.append(
        spark, path,
        spark.createDataFrame([(2, 20, 2)], "id long, v int, pt int").coalesce(1),
    )
    with pytest.raises(ValueError, match="pt_pos.*violated"):
        tl.append(
            spark, path,
            spark.createDataFrame([(3, 30, 0)], "id long, v int, pt int").coalesce(1),
        )
    assert tl.read(spark, path).count() == 2
    # r11 (r10 verdict cosmetic): the violation count is the FILE's row
    # count — every row shares the partition value — not a hardcoded 1
    with pytest.raises(ValueError, match="violated by 2 row"):
        tl.append(
            spark, path,
            spark.createDataFrame([(5, 50, 0), (6, 60, 0)],
                                  "id long, v int, pt int").coalesce(1),
        )
    assert tl.read(spark, path).count() == 2
    # NULL partition value: passes the comparison CHECK (SQL), but
    # violates a NOT NULL constraint on the partition column
    tl.append(
        spark, path,
        spark.createDataFrame([(4, 40, None)], "id long, v int, pt int").coalesce(1),
    )
    assert tl.read(spark, path).count() == 3
    with pytest.raises(ValueError, match="deletion vectors|violated"):
        tl.add_constraint(path, "pt_nn", "pt", "not_null")


def test_not_null_is_metadata_only_both_ways(spark, tbl, monkeypatch):
    """NOT NULL decides from the exact footer null_count in BOTH
    directions — a compliant append and a mixed (some-null) violating
    append alike never open a data file. (An ALL-null column records no
    footer bounds at all, so that one case legitimately falls back to
    the scan — asserted last.)"""
    tl.add_constraint(tbl, "v_nn", "v", "not_null")
    opened = []
    real = tl._scan_violations

    def spy(*a):
        opened.append(a)
        return real(*a)

    monkeypatch.setattr(tl, "_scan_violations", spy)
    tl.append(spark, tbl, _df(spark, [(3, 30)]))
    with pytest.raises(ValueError, match="violated by 1 row"):
        tl.append(spark, tbl, _df(spark, [(4, None), (5, 50)]))
    assert opened == []  # both decided from null_count alone
    # all-null column: no bounds recorded -> one scan, still caught
    with pytest.raises(ValueError, match="violated"):
        tl.append(spark, tbl, _df(spark, [(6, None)]))
    assert len(opened) == 1


def test_string_partition_constraint_fails_closed(spark, tmp_path):
    """Regression (r10 review #2): a numeric-looking value in a STRING
    partition column coerces to int in the stats, type-mismatches the
    string constraint value, and previously fell OPEN (committed). It
    must decide at the constraint value's type — or raise — never pass."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, pt string")
    tl.create(spark, path, df, partition_by=["pt"])
    tl.add_constraint(path, "pt_is_a", "pt", "=", "a")
    tl.append(
        spark, path,
        spark.createDataFrame([(2, "a")], "id long, pt string").coalesce(1),
    )
    with pytest.raises(ValueError, match="pt_is_a.*(violated|cannot be decided)"):
        tl.append(
            spark, path,
            spark.createDataFrame([(3, "7")], "id long, pt string").coalesce(1),
        )
    assert tl.read(spark, path).count() == 2
