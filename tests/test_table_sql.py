"""SQL-text DML face (sources/table_sql.py): the UPDATE/DELETE/MERGE
INTO/OPTIMIZE/VACUUM verbs as statements over the logged format — thin
text routing onto the table_log API (r12 VERDICT #6; MERGE r13 #5),
fail-loud outside the grammar.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.sources import table_log as tl
from open_data_lakehouse_demo_spark.sources.table_sql import table_dml


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "t")
    tl.create(spark, path, spark.range(10).coalesce(1).select(
        "id", (F.col("id") * 10).alias("v"), F.lit("a").alias("tag")))
    return path


def test_update_statement_routes_to_update_where(spark, tbl):
    s = table_dml(
        spark, f"UPDATE '{tbl}' SET v = v + 1, tag = 'u' WHERE id < 3"
    )
    got = {r["id"]: (r["v"], r["tag"]) for r in tl.read(spark, tbl).collect()}
    assert got[0] == (1, "u") and got[2] == (21, "u") and got[5] == (50, "a")
    m = tl._read_manifest(tbl, s)
    assert m["operation"] == "update" and "change_data" in m
    # trailing semicolon + backtick path + expression with commas/quotes
    table_dml(spark, f"UPDATE `{tbl}` SET tag = concat('x,', tag) "
                     "WHERE id >= 8;")
    got = {r["id"]: r["tag"] for r in tl.read(spark, tbl).collect()}
    assert got[9] == "x,a" and got[7] == "a"


def test_delete_statement_routes_to_delete_rows(spark, tbl):
    s = table_dml(spark, f"DELETE FROM '{tbl}' WHERE v >= 70 AND v <= 80")
    assert sorted(r["id"] for r in tl.read(spark, tbl).collect()) == \
        [0, 1, 2, 3, 4, 5, 6, 9]
    assert tl._read_manifest(tbl, s)["operation"] == "delete"
    # string literal with an escaped quote
    table_dml(spark, f"UPDATE '{tbl}' SET tag = 'it''s' WHERE id = 0")
    assert {r["tag"] for r in tl.read(spark, tbl).filter("id = 0").collect()} \
        == {"it's"}


def test_optimize_statements(spark, tmp_path):
    path = str(tmp_path / "t")
    tl.create(spark, path, spark.range(4).coalesce(1).select("id"))
    for i in range(3):
        tl.append(spark, path, spark.createDataFrame(
            [(100 + i,)], "id long").coalesce(1))
    n_files = len(tl._read_manifest(path, tl._list_snapshots(path)[-1])["files"])
    assert n_files >= 4
    s = table_dml(spark, f"OPTIMIZE '{path}' TARGET 10000")
    m = tl._read_manifest(path, s)
    assert m["operation"] == "compact" and len(m["files"]) < n_files
    assert tl.read(spark, path).count() == 7
    s2 = table_dml(spark, f"OPTIMIZE '{path}' ZORDER BY (id)")
    assert tl._read_manifest(path, s2)["operation"] == "optimize_zorder"
    assert tl.read(spark, path).count() == 7


def test_vacuum_statement(spark, tbl):
    tl.append(spark, tbl, spark.createDataFrame([(50, 500, "z")],
                                                "id long, v long, tag string"))
    table_dml(spark, f"VACUUM '{tbl}' KEEP 1")
    assert len(tl._list_snapshots(tbl)) == 1
    assert tl.read(spark, tbl).count() == 11


def test_keywords_inside_string_literals_are_data(spark, tbl):
    """r12 review: WHERE/AND inside a quoted literal must parse as data,
    not grammar — the old regex split bound the WHERE inside
    SET tag = 'a WHERE b'."""
    table_dml(spark, f"UPDATE '{tbl}' SET tag = 'a WHERE b' WHERE id = 1")
    got = {r["id"]: r["tag"] for r in tl.read(spark, tbl).collect()}
    assert got[1] == "a WHERE b" and got[2] == "a"
    table_dml(spark, f"UPDATE '{tbl}' SET tag = 'x AND y' WHERE id = 2")
    got = {r["id"]: r["tag"] for r in tl.read(spark, tbl).collect()}
    assert got[2] == "x AND y"
    # AND inside a predicate string literal is data too
    n0 = tl.read(spark, tbl).count()
    table_dml(spark, f"DELETE FROM '{tbl}' WHERE tag = 'x AND y'")
    assert tl.read(spark, tbl).count() == n0 - 1


def test_grammar_fails_loud(spark, tbl):
    with pytest.raises(ValueError, match="unsupported predicate"):
        table_dml(spark, f"DELETE FROM '{tbl}' WHERE id < 3 OR id > 8")
    # r12 review: KEEP 0 would delete the whole table on a typo
    with pytest.raises(ValueError, match="KEEP must be >= 1"):
        table_dml(spark, f"VACUUM '{tbl}' KEEP 0")
    assert tl.read(spark, tbl).count() == 10
    with pytest.raises(ValueError, match="quoted"):
        table_dml(spark, f"DELETE FROM {tbl} WHERE id < 3")
    with pytest.raises(ValueError, match="unsupported literal"):
        table_dml(spark, f"DELETE FROM '{tbl}' WHERE id < CURRENT_DATE")
    # MERGE is a verb now (r13) — but only the exact upsert grammar
    with pytest.raises(ValueError, match="key-column list"):
        table_dml(spark, f"MERGE INTO '{tbl}' USING x ON 1=1")
    with pytest.raises(ValueError, match="quoted logged-table path"):
        table_dml(
            spark,
            f"MERGE INTO '{tbl}' USING x ON (id) WHEN MATCHED THEN "
            "UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        )
    with pytest.raises(ValueError, match="UPDATE SET \\*"):
        table_dml(
            spark,
            f"MERGE INTO '{tbl}' USING '{tbl}' ON (id) "
            "WHEN MATCHED THEN DELETE",
        )
    # nothing above committed anything
    assert len(tl._list_snapshots(tbl)) == 1


def test_merge_statement_routes_to_merge(spark, tbl, tmp_path):
    """r13 (VERDICT #5): the fifth runbook verb — MERGE INTO drives
    tl.merge through text, with its CDC sidecar recorded, from both a
    parenthesized SELECT source and a quoted logged-table path."""
    # subquery source: update id 1, insert id 100
    spark.range(1).createOrReplaceTempView("one")
    s = table_dml(
        spark,
        f"MERGE INTO '{tbl}' USING "
        "(SELECT x.id, CAST(x.id * 1000 AS LONG) AS v, 'm' AS tag "
        " FROM (SELECT id + 1 AS id FROM one UNION ALL "
        "       SELECT 100 AS id FROM one) x) "
        f"ON (id) "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *;",
    )
    got = {r["id"]: (r["v"], r["tag"]) for r in tl.read(spark, tbl).collect()}
    assert got[1] == (1000, "m") and got[100] == (100000, "m")
    assert got[2] == (20, "a") and len(got) == 11
    m = tl._read_manifest(tbl, s)
    assert m["operation"] == "merge" and m.get("change_data")
    # the feed represents the text-driven upsert (update pair + insert)
    feed, _ = tl.table_changes_feed(spark, tbl, s - 1)
    ch = sorted((r["id"], r["_change_type"]) for r in feed.collect())
    assert ch == [(1, "update_postimage"), (1, "update_preimage"),
                  (100, "insert")]
    # quoted-path source: a second logged table upserts in
    src = str(tmp_path / "src")
    tl.create(spark, src, spark.createDataFrame(
        [(2, 222, "p"), (101, 111, "p")], "id long, v long, tag string"
    ).coalesce(1))
    table_dml(
        spark,
        f"MERGE INTO `{tbl}` USING '{src}' ON (id) "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    got = {r["id"]: (r["v"], r["tag"]) for r in tl.read(spark, tbl).collect()}
    assert got[2] == (222, "p") and got[101] == (111, "p") and len(got) == 12
