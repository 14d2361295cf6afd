"""ALTER TABLE schema evolution on the logged table format
(sources/table_log.py add_column/rename_column/widen_column/drop_column).

The reference's Iceberg tables get these operations from the format
(lakehouse_part1_load_data.py:235-240 creates Iceberg tables; Iceberg
spec "Schema Evolution": add/rename/widen/drop are metadata-only
commits, old data files are never rewritten). table_log reproduces the
same contracts without parquet field-ids via the manifest's
physical-name mapping + retired-name guard; these tests pin:

  * every alter is metadata-only (file list identical before/after);
  * old files read correctly under the NEW contract (rename coalesces
    the historical physical name, widen upcasts int32->long /
    float->double in the parquet reader, add reads as typed NULL);
  * scan pruning stays SOUND across renames/widens (plan_scan binds
    predicate bounds to each file's historical stats name);
  * time travel / rollback keep the per-snapshot reader contract;
  * name reuse after drop/rename is refused everywhere (the one
    field-id-only contract, failed loudly instead of silently
    resurrecting old physical values).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_data_lakehouse_demo_spark.sources import table_log as tl


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def tbl(spark, tmp_path):
    """A two-file int table: file of ids 0..4 (snapshot 0) + 5..9
    (snapshot 1), columns (id int, v int, tag string)."""
    path = str(tmp_path / "t")

    def mk(lo, hi, tag):
        # one data file per snapshot so the pruning assertions below can
        # name exact keep/skip counts
        return spark.range(lo, hi).coalesce(1).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") * 10).cast("int").alias("v"),
            F.lit(tag).alias("tag"),
        )

    tl.create(spark, path, mk(0, 5, "a"))
    tl.append(spark, path, mk(5, 10, "b"))
    return path


def _files(path):
    snaps = tl._list_snapshots(path)
    return tl._read_manifest(path, snaps[-1])["files"]


def test_add_column_metadata_only(spark, tbl):
    before = _files(tbl)
    snap = tl.add_column(tbl, "score", "double")
    assert _files(tbl) == before  # zero data IO
    df = tl.read(spark, tbl)
    assert df.schema["score"].dataType == T.DoubleType()
    assert df.where(F.col("score").isNull()).count() == 10
    # later appends supply values; old rows stay NULL
    more = spark.createDataFrame(
        [(100, 1000, "c", 0.5)], "id int, v int, tag string, score double"
    )
    tl.append(spark, tbl, more)
    got = tl.read(spark, tbl)
    assert got.where("score = 0.5").count() == 1
    assert got.where("score is null").count() == 10
    # time travel: pre-alter snapshot has no score column
    assert "score" not in tl.read(spark, tbl, snapshot=snap - 1).columns


def test_add_column_rejects_existing_and_bad_type(spark, tbl):
    with pytest.raises(ValueError, match="already exists"):
        tl.add_column(tbl, "v", "long")


def test_rename_reads_old_files_and_prunes(spark, tbl):
    tl.rename_column(tbl, "v", "value")
    df = tl.read(spark, tbl)
    assert "v" not in df.columns and "value" in df.columns
    assert _rows(df.select("id", "value")) == [(i, i * 10) for i in range(10)]
    # pruning on the NEW name must bind to the OLD name's file stats:
    # file 1 holds v in [50,90] — a value<30 predicate proves it out
    keep, skip = tl.plan_scan(tbl, [("value", "<", 30)])
    assert len(keep) == 1 and len(skip) == 1
    assert _rows(tl.read_where(spark, tbl, [("value", "<", 30)])) == _rows(
        tl.read(spark, tbl).filter("value < 30")
    )
    # appends after the rename write the new physical name and mix fine
    tl.append(
        spark, tbl,
        spark.createDataFrame([(50, 999, "c")], "id int, value int, tag string").coalesce(1),
    )
    got = tl.read(spark, tbl)
    assert got.count() == 11 and got.where("value = 999").count() == 1
    # delete through the renamed column hits rows in pre-rename files
    tl.delete_rows(spark, tbl, [("value", "=", 30)])
    assert tl.read(spark, tbl).where("id = 3").count() == 0


def test_rename_then_compact_normalizes_physical_names(spark, tbl):
    tl.rename_column(tbl, "v", "value")
    expect = _rows(tl.read(spark, tbl))
    tl.compact(spark, tbl, target_files=1)
    assert _rows(tl.read(spark, tbl)) == expect
    # compacted files physically carry the current name
    import pyarrow.parquet as pq
    import os

    f = _files(tbl)[0]
    names = pq.read_schema(os.path.join(tbl, f)).names
    assert "value" in names and "v" not in names


def test_widen_int_to_long(spark, tbl):
    tl.widen_column(tbl, "v", "long")
    df = tl.read(spark, tbl)
    assert df.schema["v"].dataType == T.LongType()
    assert _rows(df.select("id", "v")) == [(i, i * 10) for i in range(10)]
    # post-widen appends may carry values beyond int32 range
    big = 5 * 10**9
    tl.append(
        spark, tbl,
        spark.createDataFrame([(99, big, "c")], "id int, v long, tag string").coalesce(1),
    )
    got = tl.read(spark, tbl)
    assert got.where(F.col("v") == big).count() == 1
    assert got.count() == 11
    # pruning soundness across the physical int32/int64 file mix: the
    # two narrow files' bounds prove them out for v > 2^31
    keep, skip = tl.plan_scan(tbl, [("v", ">", 2**31)])
    assert len(keep) == 1 and len(skip) == 2
    assert _rows(tl.read_where(spark, tbl, [("v", ">", 2**31)])) == [(99, big, "c")]


def test_widen_float_to_double_and_rejects_narrowing(spark, tmp_path):
    path = str(tmp_path / "t")
    tl.create(
        spark, path,
        spark.createDataFrame([(1, 1.5)], "id int, x float"),
    )
    tl.widen_column(path, "x", "double")
    assert tl.read(spark, path).schema["x"].dataType == T.DoubleType()
    assert tl.read(spark, path).collect()[0]["x"] == 1.5
    with pytest.raises(ValueError, match="cannot widen"):
        tl.widen_column(path, "x", "float")
    with pytest.raises(ValueError, match="cannot widen"):
        tl.widen_column(path, "id", "string")


def test_drop_column_and_name_reuse_refused(spark, tbl):
    before = _files(tbl)
    tl.drop_column(tbl, "tag")
    assert _files(tbl) == before  # metadata-only
    assert "tag" not in tl.read(spark, tbl).columns
    # the one field-id-only contract fails LOUDLY in every writer path
    with pytest.raises(ValueError, match="previously dropped"):
        tl.add_column(tbl, "tag", "string")
    with pytest.raises(ValueError, match="previously dropped"):
        tl.append(
            spark, tbl,
            spark.createDataFrame([(1, 1, "x")], "id int, v int, tag string"),
        )
    with pytest.raises(ValueError, match="retired"):
        tl.overwrite(
            spark, tbl,
            spark.createDataFrame([(1, 1, "x")], "id int, v int, tag string"),
        )
    with pytest.raises(ValueError, match="retired"):
        tl.rename_column(tbl, "v", "tag")
    # compact after the drop physically sheds the column; time travel to
    # the pre-drop snapshot still sees it (old files intact until vacuum)
    snaps = tl._list_snapshots(tbl)
    tl.compact(spark, tbl, target_files=1)
    assert "tag" in tl.read(spark, tbl, snapshot=snaps[0]).columns
    assert tl.read(spark, tbl).count() == 10


def test_drop_guards(spark, tmp_path):
    path = str(tmp_path / "t")
    tl.create(spark, path, spark.createDataFrame([(1,)], "id int"))
    with pytest.raises(ValueError, match="last column"):
        tl.drop_column(path, "id")
    with pytest.raises(ValueError, match="no column"):
        tl.drop_column(path, "nope")


def test_partition_column_alters_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(6).select(
        F.col("id"), (F.col("id") % 2).cast("int").alias("p")
    )
    tl.create(spark, path, df, partition_by=["p"])
    with pytest.raises(ValueError, match="partition column"):
        tl.rename_column(path, "p", "q")
    with pytest.raises(ValueError, match="partition column"):
        tl.widen_column(path, "p", "long")
    with pytest.raises(ValueError, match="partition column"):
        tl.drop_column(path, "p")
    # non-partition alters on a partitioned table still work end-to-end
    tl.rename_column(path, "id", "ident")
    got = tl.read(spark, path)
    assert _rows(got.select("ident", "p")) == [(i, i % 2) for i in range(6)]
    keep, skip = tl.plan_scan(path, [("p", "=", 0)])
    assert skip  # partition pruning unaffected by the rename


def test_chained_alters_and_merge(spark, tbl):
    """rename -> widen -> add on one table; MERGE through the renamed
    key still upserts correctly (rewrites conform to current schema)."""
    tl.rename_column(tbl, "v", "value")
    tl.widen_column(tbl, "value", "long")
    tl.add_column(tbl, "score", "double")
    src = spark.createDataFrame(
        [(3, 7 * 10**9, "upd", 1.0), (42, 1, "new", 2.0)],
        "id int, value long, tag string, score double",
    )
    tl.merge(spark, tbl, src, on=["id"])
    got = tl.read(spark, tbl)
    assert got.count() == 11
    assert _rows(got.where("id = 3")) == [(3, 7 * 10**9, "upd", 1.0)]
    assert got.where("id = 4 and value = 40 and score is null").count() == 1
    # read_where ≡ read().filter on the fully-evolved table
    assert _rows(tl.read_where(spark, tbl, [("value", ">=", 40)])) == _rows(
        got.filter("value >= 40")
    )


def test_rollback_across_rename_unretires_live_column(spark, tbl):
    pre = tl._list_snapshots(tbl)[-1]
    tl.rename_column(tbl, "v", "value")
    tl.rollback(spark, tbl, pre)
    got = tl.read(spark, tbl)
    assert "v" in got.columns and "value" not in got.columns
    assert got.count() == 10
    # 'v' is a LIVE column again (backed by the restored files), so the
    # rollback un-retires it: every write path accepts it again...
    tl.append(
        spark, tbl,
        spark.createDataFrame([(77, 770, "z")], "id int, v int, tag string"),
    )
    tl.rename_column(tbl, "v", "value")  # ...including a fresh rename,
    with pytest.raises(ValueError, match="retired|previously dropped"):
        tl.add_column(tbl, "v", "int")  # which retires it once more


def test_alter_rebases_over_concurrent_append(spark, tbl, monkeypatch):
    """An append that lands between the alter's manifest read and its
    commit must not be clobbered: the alter rebases onto the winner."""
    real_pin = tl._pin_latest
    fired = {"done": False}

    def racing_pin(path):
        out = real_pin(path)
        if not fired["done"]:
            fired["done"] = True
            tl.append(
                spark, path,
                spark.createDataFrame([(77, 770, "z")], "id int, v int, tag string"),
            )
        return out

    monkeypatch.setattr(tl, "_pin_latest", racing_pin)
    tl.add_column(tbl, "score", "double")
    monkeypatch.setattr(tl, "_pin_latest", real_pin)
    got = tl.read(spark, tbl)
    assert got.where("id = 77").count() == 1  # append survived
    assert "score" in got.columns  # alter landed after rebase


def test_snapshots_table_shows_alter_operations(spark, tbl):
    tl.rename_column(tbl, "v", "value")
    tl.widen_column(tbl, "value", "long")
    ops = [r["operation"] for r in tl.snapshots_table(spark, tbl).collect()]
    assert "rename-column" in ops and "widen-column" in ops


def test_model_based_random_alter_sequence(spark, tmp_path):
    """Model check over the FULL op mix including alters: a seeded random
    sequence of append / add / rename / widen / drop / delete_rows /
    delete_rows_mor / compact / rollback, mirrored against an in-memory model of (schema,
    rows). After every op the latest read matches the model, and at the
    end every recorded snapshot still reads back as the exact (schema,
    rows) state the model had when that snapshot committed — alters must
    never leak a newer reader contract into an older snapshot."""
    import random

    rnd = random.Random(20260816)
    path = str(tmp_path / "t")

    # model: schema = ordered dict name -> "int"|"long"; rows: id -> {col: val|None}
    schema = {"id": "long", "c0": "int", "c1": "int"}
    rows = {i: {"c0": i * 2, "c1": i * 3} for i in range(6)}
    fresh = iter(f"n{i}" for i in range(100))  # never-reused name pool

    def df_of(sch, rws):
        ddl = ", ".join(f"{c} {t}" for c, t in sch.items())
        data = [
            tuple([k] + [r.get(c) for c in sch if c != "id"])
            for k, r in sorted(rws.items())
        ]
        return spark.createDataFrame(data or [], ddl).coalesce(1)

    def read_state(snap=None):
        df = tl.read(spark, path, snapshot=snap)
        cols = df.columns
        return cols, {
            r["id"]: {c: r[c] for c in cols if c != "id"} for r in df.collect()
        }

    tl.create(spark, path, df_of(schema, rows))
    states = {0: (dict(schema), {k: dict(v) for k, v in rows.items()})}
    tagged: dict[str, int] = {}
    next_id = 100

    for step in range(16):
        data_cols = [c for c in schema if c != "id"]
        op = rnd.choice(
            ["append", "add", "rename", "widen", "drop", "delete", "mor",
             "compact", "rollback", "tag"]
        )
        if op == "append":
            n = rnd.randrange(1, 4)
            new = {}
            for _ in range(n):
                new[next_id] = {
                    c: (rnd.randrange(5 * 10**9) if schema[c] == "long"
                        else rnd.randrange(1000))
                    for c in data_cols
                }
                next_id += 1
            s = tl.append(spark, path, df_of(schema, new))
            rows.update(new)
        elif op == "add":
            c = next(fresh)
            s = tl.add_column(path, c, "int")
            schema[c] = "int"
            for r in rows.values():
                r[c] = None
        elif op == "rename":
            old = rnd.choice(data_cols)
            new = next(fresh)
            s = tl.rename_column(path, old, new)
            schema = {new if k == old else k: t for k, t in schema.items()}
            for r in rows.values():
                r[new] = r.pop(old)
        elif op == "widen":
            ints = [c for c in data_cols if schema[c] == "int"]
            if not ints:
                continue
            c = rnd.choice(ints)
            s = tl.widen_column(path, c, "long")
            schema[c] = "long"
        elif op == "drop":
            if len(data_cols) < 2:
                continue
            c = rnd.choice(data_cols)
            s = tl.drop_column(path, c)
            del schema[c]
            for r in rows.values():
                r.pop(c, None)
        elif op == "delete":
            c = rnd.choice(data_cols)
            cut = rnd.randrange(500)
            s = tl.delete_rows(spark, path, [(c, "<", cut)])
            # NULL-predicate rows survive (SQL DELETE semantics)
            rows = {
                k: r for k, r in rows.items()
                if r.get(c) is None or not (r[c] < cut)
            }
        elif op == "mor":
            # merge-on-read delete: same model semantics as "delete",
            # but the table keeps its files and gains a deletion vector
            c = rnd.choice(data_cols)
            cut = rnd.randrange(500)
            s = tl.delete_rows_mor(spark, path, [(c, "<", cut)])
            rows = {
                k: r for k, r in rows.items()
                if r.get(c) is None or not (r[c] < cut)
            }
        elif op == "tag":
            # metadata-only named ref: no state change, but the tagged
            # snapshot must read back as its recorded state at the end
            name = f"t{step}"
            s = tl.tag(path, name)
            tagged[name] = s
            s = tl._list_snapshots(path)[-1]  # no new snapshot
        elif op == "compact":
            s = tl.compact(spark, path)
        else:  # rollback
            target = rnd.choice(sorted(states))
            s = tl.rollback(spark, path, target)
            sch, rws = states[target]
            schema = dict(sch)
            rows = {k: dict(v) for k, v in rws.items()}
        states[s] = (dict(schema), {k: dict(v) for k, v in rows.items()})
        cols, got = read_state()
        assert cols == list(schema), f"step {step} op {op}: schema {cols}"
        assert got == rows, f"step {step} op {op}"
    # every historical snapshot keeps its own (schema, rows) contract
    for snap, (sch, rws) in states.items():
        cols, got = read_state(snap)
        assert cols == list(sch), f"snapshot {snap} schema"
        assert got == rws, f"snapshot {snap} rows"
    # and every tag still resolves to exactly its recorded state
    assert tl.tags(path) == tagged
    for name, snap in tagged.items():
        df = tl.read_tag(spark, path, name)
        sch, rws = states[snap]
        assert df.columns == list(sch), f"tag {name}"
        got = {r["id"]: {c: r[c] for c in df.columns if c != "id"}
               for r in df.collect()}
        assert got == rws, f"tag {name}"


def test_read_where_pushes_filters_through_rename(spark, tbl):
    """Plan pin: a rename must not cost parquet row-group skipping on
    the stats-pruned read path. The conformed filter sits on
    coalesce(new, old) — unpushable — so read_where injects the implied
    raw-level disjunction (new op v) OR (old op v), which the parquet
    source accepts as an Or over plain attributes. At 100 TB this is
    row-group skipping on every pre-rename file."""
    import re

    tl.rename_column(tbl, "v", "value")
    d = tl.read_where(spark, tbl, [("value", ">", 55)])
    plan = d._jdf.queryExecution().executedPlan().toString()
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "Or(GreaterThan(value,55),GreaterThan(v,55))" in pushed, plan
    assert _rows(d) == _rows(tl.read(spark, tbl).filter("value > 55"))
