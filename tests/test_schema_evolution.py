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


@pytest.mark.parametrize("seed", [11, 12, 13, 14])
def test_model_based_random_op_sequence(spark, tmp_path, seed):
    """Model check over the FULL r10 surface (r11, VERDICT item #5): a
    seeded random sequence over SIXTEEN op kinds — append / add /
    rename / widen / drop / delete_rows / delete_rows_mor / update_where
    / compact / rollback / tag / add_constraint / drop_constraint / WAP
    stage / publish / discard — mirrored against an in-memory model of
    (schema, rows, constraints, live-DV flag). Four seeds x 50 steps =
    200 random operations fuzzing the interaction matrix (constraints
    vs DVs, constraints vs rollback/rename/drop, WAP vs mid-flight
    alters, compaction interleavings), not just pairwise tests.

    The model PREDICTS failures, and the raise is asserted: appends and
    publishes that violate a live constraint, add_constraint over live
    deletion vectors or violating existing rows, dropping a
    constraint-bound column, publishing a stage after a rename/drop
    retired one of its columns. After every op the latest read matches
    the model; at the end every recorded snapshot still reads back as
    the exact state the model had when it committed (alters must never
    leak a newer contract into an older snapshot), and every tag
    resolves to its recorded state."""
    import random

    rnd = random.Random(seed)
    path = str(tmp_path / "t")

    # model: schema = ordered dict name -> "int"|"long"; rows: id ->
    # {col: val|None}; cons: name -> [col, op, (value)]; has_dvs: bool
    schema = {"id": "long", "c0": "int", "c1": "int"}
    rows = {i: {"c0": i * 2 + 200, "c1": i * 3 + 200} for i in range(6)}
    cons: dict[str, list] = {}
    has_dvs = False
    pending = None  # in-flight WAP stage: {"receipt", "rows", "cols"}
    fresh = iter(f"n{i}" for i in range(400))  # never-reused name pool
    fresh_con = iter(f"k{i}" for i in range(400))

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

    def gen_rows(sch, n):
        nonlocal next_id
        out = {}
        for _ in range(n):
            out[next_id] = {
                c: (rnd.randrange(5 * 10**9) if sch[c] == "long"
                    else rnd.randrange(1000))
                for c in sch if c != "id"
            }
            next_id += 1
        return out

    def violating(rws):
        """Rows in rws that violate any model constraint (SQL CHECK:
        NULL passes; not_null: NULL/absent violates)."""
        bad = 0
        for r in rws.values():
            for spec in cons.values():
                v = r.get(spec[0])
                if spec[1] == "not_null":
                    bad += v is None
                elif v is not None and not (v >= spec[2]):
                    bad += 1
        return bad

    tl.create(spark, path, df_of(schema, rows))
    states = {0: (dict(schema), {k: dict(v) for k, v in rows.items()})}
    # full model state per snapshot (adds constraints + live-DV flag):
    # rollback restores ALL of it, not just schema+rows
    states_full = {0: (dict(schema), {k: dict(v) for k, v in rows.items()},
                       {}, False)}
    tagged: dict[str, int] = {}
    next_id = 100

    for step in range(50):
        data_cols = [c for c in schema if c != "id"]
        op = rnd.choice(
            ["append", "add", "rename", "widen", "drop", "delete", "mor",
             "update", "compact", "rollback", "tag",
             "addcon", "dropcon", "stage", "publish", "discard"]
        )
        if op == "append":
            new = gen_rows(schema, rnd.randrange(1, 4))
            if violating(new):
                with pytest.raises(ValueError, match="violated"):
                    tl.append(spark, path, df_of(schema, new))
                cols, got = read_state()
                assert got == rows, f"seed {seed} step {step}: failed append leaked"
                continue
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
            # constraints bind the logical column: they follow the rename
            for spec in cons.values():
                if spec[0] == old:
                    spec[0] = new
            if pending is not None:
                # the staged FILE's physical column now reads through
                # the rename-aware conform path, so the staged VALUES
                # follow the rename too (pending["cols"] keeps the
                # stage-time names — that is what the retired-name
                # publish guard sees)
                for r in pending["rows"].values():
                    if old in r:
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
            if any(spec[0] == c for spec in cons.values()):
                with pytest.raises(ValueError, match="bound by constraint"):
                    tl.drop_column(path, c)
                continue
            s = tl.drop_column(path, c)
            del schema[c]
            for r in rows.values():
                r.pop(c, None)
        elif op == "delete":
            c = rnd.choice(data_cols)
            cut = rnd.randrange(500)
            s = tl.delete_rows(spark, path, [(c, "<", cut)])
            # NULL-predicate rows survive (SQL DELETE semantics);
            # existing deletion vectors carry (file-granular COW)
            rows = {
                k: r for k, r in rows.items()
                if r.get(c) is None or not (r[c] < cut)
            }
        elif op == "mor":
            # merge-on-read delete: same row semantics as "delete", but
            # the table keeps its files and gains a deletion vector
            # (only when something actually matched)
            c = rnd.choice(data_cols)
            cut = rnd.randrange(500)
            survivors = {
                k: r for k, r in rows.items()
                if r.get(c) is None or not (r[c] < cut)
            }
            s = tl.delete_rows_mor(spark, path, [(c, "<", cut)])
            if len(survivors) < len(rows):
                has_dvs = True
            rows = survivors
        elif op == "update":
            # copy-on-write UPDATE: matching rows get tgt += k (SQL:
            # NULL predicate doesn't match; NULL + k stays NULL).
            # k >= 0 so a ">=" constraint can't be violated, and
            # not_null constraints can't coexist with NULLs (addcon
            # refuses them) — the model predicts success.
            c = rnd.choice(data_cols)
            tgt = rnd.choice(data_cols)
            cut = rnd.randrange(500)
            k = rnd.randrange(50)
            s = tl.update_where(
                spark, path, [(c, "<", cut)], {tgt: f"{tgt} + {k}"}
            )
            for r in rows.values():
                if r.get(c) is not None and r[c] < cut and r.get(tgt) is not None:
                    r[tgt] = r[tgt] + k
        elif op == "tag":
            name = f"t{step}"
            s = tl.tag(path, name)
            tagged[name] = s
            s = tl._list_snapshots(path)[-1]  # no new snapshot
        elif op == "compact":
            s = tl.compact(spark, path)
            has_dvs = False  # compaction materializes the deletes
        elif op == "addcon":
            c = rnd.choice(data_cols)
            name = next(fresh_con)
            spec = (["not_null"] if rnd.random() < 0.2
                    else [">=", rnd.randrange(300)])
            if has_dvs:
                with pytest.raises(ValueError, match="deletion vectors"):
                    tl.add_constraint(path, name, c, spec[0],
                                      *spec[1:])
                continue
            # does EXISTING data violate the candidate constraint?
            if spec[0] == "not_null":
                bad = any(r.get(c) is None for r in rows.values())
            else:
                bad = any(r.get(c) is not None and not (r[c] >= spec[1])
                          for r in rows.values())
            if bad:
                with pytest.raises(ValueError, match="violated"):
                    tl.add_constraint(path, name, c, spec[0], *spec[1:])
                continue
            s = tl.add_constraint(path, name, c, spec[0], *spec[1:])
            cons[name] = [c, spec[0]] + spec[1:]
        elif op == "dropcon":
            if not cons:
                continue
            name = rnd.choice(sorted(cons))
            s = tl.drop_constraint(path, name)
            del cons[name]
        elif op == "stage":
            if pending is not None:
                continue
            staged_rows = gen_rows(schema, rnd.randrange(1, 4))
            receipt = tl.stage_append(spark, path, df_of(schema, staged_rows))
            pending = {"receipt": receipt, "rows": staged_rows,
                       "cols": list(schema)}
            continue  # no snapshot, nothing visible
        elif op == "discard":
            if pending is None:
                continue
            tl.discard_staged(path, pending["receipt"])
            pending = None
            continue
        elif op == "publish":
            if pending is None:
                continue
            retired = [c for c in pending["cols"] if c not in schema]
            staged_vis = {
                k: {c: r.get(c) for c in schema if c != "id"}
                for k, r in pending["rows"].items()
            }
            # precedence mirrors _append_loop: constraints are enforced
            # on the placed FILES before the schema's retired-name guard
            if violating(staged_vis):
                # constraints are enforced at PUBLISH time, including
                # ones added after the stage was written
                with pytest.raises(ValueError, match="violated"):
                    tl.publish_staged(spark, path, pending["receipt"])
                tl.discard_staged(path, pending["receipt"])
                pending = None
                continue
            if retired:
                # a rename/drop since the stage retired one of its
                # column names: additive evolution must refuse to
                # resurrect it
                with pytest.raises(ValueError, match="previously dropped"):
                    tl.publish_staged(spark, path, pending["receipt"])
                tl.discard_staged(path, pending["receipt"])
                pending = None
                continue
            s = tl.publish_staged(spark, path, pending["receipt"])
            rows.update(staged_vis)
            pending = None
        else:  # rollback
            target = rnd.choice(sorted(states))
            if pending is not None:
                # this fuzz discards in-flight stages across rollbacks:
                # publishing into a rolled-back schema is additive
                # evolution, modeled separately
                tl.discard_staged(path, pending["receipt"])
                pending = None
            s = tl.rollback(spark, path, target)
            sch, rws, cns, dv = states_full[target]
            schema = dict(sch)
            rows = {k: dict(v) for k, v in rws.items()}
            cons = {n: list(sp) for n, sp in cns.items()}
            has_dvs = dv
        states[s] = (dict(schema), {k: dict(v) for k, v in rows.items()})
        states_full[s] = (dict(schema),
                          {k: dict(v) for k, v in rows.items()},
                          {n: list(sp) for n, sp in cons.items()},
                          has_dvs)
        cols, got = read_state()
        assert cols == list(schema), f"seed {seed} step {step} op {op}: schema {cols}"
        assert got == rows, f"seed {seed} step {step} op {op}"
        # r12 invariant: no retained deletion vector may be fully inert
        # (naming only files the snapshot no longer references) — every
        # partial-COW op shares _dv_shed, so the MoR anti-join tax can
        # only shrink, never ratchet
        import os as _os
        import pyarrow.parquet as _pq

        m_now = tl._read_manifest(path, tl._list_snapshots(path)[-1])
        present = set(m_now["files"])
        for dv in m_now.get("delete_vectors") or []:
            names = set(
                _pq.read_table(_os.path.join(path, dv), columns=["__fname"])
                .column("__fname").to_pylist()
            )
            assert names & present, (
                f"seed {seed} step {step} op {op}: inert deletion vector "
                f"{dv} retained"
            )
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
