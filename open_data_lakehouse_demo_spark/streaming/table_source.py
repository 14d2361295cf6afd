"""``format("table_log")``: a PySpark custom data source over the logged
table format — the native face of what the reference gets from Iceberg's
Spark integration (`spark.read.format("iceberg")`,
lakehouse_part1_load_data.py:505-508; streaming reads of catalog tables,
code/pyspark-job.py:121-131).

Built on Spark 4's Python DataSource API (pyspark.sql.datasource):

  * BATCH: ``spark.read.format("table_log").load(path)`` — one input
    partition per manifest data file (snapshot-pinned, so a concurrent
    append never changes a running scan), Arrow record batches from the
    workers (never row-at-a-time Python), schema-evolution conform
    applied per file (rename/widen/add) from the manifest contract.
    ``option("snapshot", n)`` time-travels.
  * STREAMING: ``spark.readStream.format("table_log").load(path)`` —
    offsets ARE snapshot ids, so Spark's own checkpointing provides
    exactly-once consumption of appends (the Delta streaming-source
    contract, same semantics as table_log.table_changes). Rewrites or
    deletes in the range fail the stream (``ignoreRewrites`` skips
    them, the no-retraction trade); a schema-changing alter fails the
    stream with a restart instruction, like Delta's schema-change stop.

Scale shape: driver-side work is manifest JSON only (file lists +
bounds); each worker reads exactly one immutable parquet file via
pyarrow and yields record batches. At 100 TB a micro-batch plans
O(new files) partitions regardless of table size.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

from open_data_lakehouse_demo_spark.sources import table_log as tl

@dataclass
class _FilePart(InputPartition):
    """One manifest data file + everything a worker needs to conform it
    to the query schema without any driver callback: the absolute path,
    per-field historical physical names, the hive-style partition
    values parsed from the relative path (single-file pyarrow reads do
    not synthesize partition columns), and this file's deleted row
    positions from the snapshot's deletion vectors (merge-on-read)."""

    abs_path: str
    fields: list = field(default_factory=list)  # [(name, [phys...]), ...]
    part_values: dict = field(default_factory=dict)  # {col: raw string}
    deleted: list = field(default_factory=list)  # sorted row indices


def _partition_values(rel_path: str) -> dict:
    return tl._partition_raw_values(rel_path)


def _deleted_positions(path: str, m: dict) -> dict:
    """Driver-side: the snapshot's deletion vectors grouped per data
    file ({rel_path: [row_index, ...]}); MoR's premise is deletes ≪
    data, so this is a small metadata read."""
    dv_files = m.get("delete_vectors") or []
    if not dv_files:
        return {}
    import pyarrow.parquet as pq

    present = set(m["files"])
    out: dict = {}
    for dv in dv_files:
        t = pq.read_table(os.path.join(path, dv))
        for fname, ri in zip(t.column("__fname").to_pylist(),
                             t.column("__ri").to_pylist()):
            if fname in present:
                out.setdefault(fname, []).append(ri)
    return out


def _file_partitions(path: str, m: dict, files: list[str], schema) -> list:
    fields = [(f.name, tl._phys_names(m, f.name)) for f in schema.fields]
    deleted = _deleted_positions(path, m)
    return [
        _FilePart(
            abs_path=os.path.join(path, f),
            fields=fields,
            part_values=_partition_values(f),
            deleted=sorted(deleted.get(f, [])),
        )
        for f in files
    ]


def _read_file_part(part: _FilePart, arrow_schema):
    """Worker-side: read ONE immutable parquet file and conform it to
    the query's Arrow schema — resolve each field through its historical
    physical names (exactly one exists per file), null-fill absent
    fields (pre-add files), cast narrow physical types up (pre-widen
    files), materialize hive partition values. Yields Arrow batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(part.abs_path)
    if part.deleted:
        # merge-on-read: drop this file's deleted row positions before
        # conforming (row order in the read table IS file order)
        import numpy as np

        keep = np.ones(tbl.num_rows, dtype=bool)
        keep[part.deleted] = False
        tbl = tbl.filter(pa.array(keep))
    n = tbl.num_rows
    arrays = []
    for (name, phys), target in zip(part.fields, arrow_schema):
        col = None
        for p in phys:
            if p in tbl.column_names:
                col = tbl.column(p)
                break
        if col is not None:
            arr = col.cast(target.type) if col.type != target.type else col
        elif name in part.part_values:
            raw = part.part_values[name]
            if raw == "__HIVE_DEFAULT_PARTITION__":
                # the NULL-partition marker is a path encoding, not a
                # value — materialize NULL like table_log.read() does
                arr = pa.nulls(n, type=target.type)
            else:
                arr = pa.array([raw] * n).cast(target.type)
        else:
            arr = pa.nulls(n, type=target.type)
        arrays.append(arr)
    out = pa.table(arrays, schema=arrow_schema)
    yield from out.to_batches()


def _arrow_schema(schema):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _resolve_snapshot(options) -> int | None:
    """Batch time travel: option("snapshot", n) by id, option("tag",
    name) by immutable ref, option("asOfTimestamp", ms) by commit time
    (Iceberg's VERSION AS OF / FOR SYSTEM_TIME AS OF). None = latest."""
    path = options["path"]
    given = [k for k in ("snapshot", "tag", "asoftimestamp") if k in options]
    if len(given) > 1:
        raise ValueError(f"pass at most one of snapshot/tag/asOfTimestamp, got {given}")
    if "snapshot" in options:
        return int(options["snapshot"])
    if "tag" in options:
        refs = tl.tags(path)
        name = options["tag"]
        if name not in refs:
            raise ValueError(f"no tag {name!r}; have {sorted(refs)}")
        return refs[name]
    if "asoftimestamp" in options:
        return tl._snapshot_asof(path, int(options["asoftimestamp"]))
    return None


class _TableLogBatchReader(DataSourceReader):
    def __init__(self, schema, options):
        self.path = options["path"]
        self.snapshot = _resolve_snapshot(options)
        self.schema = schema
        self.arrow_schema = _arrow_schema(schema)

    def partitions(self):
        snaps = tl._list_snapshots(self.path)
        snap = self.snapshot if self.snapshot is not None else snaps[-1]
        m = tl._read_manifest(self.path, snap)
        parts = _file_partitions(self.path, m, m["files"], self.schema)
        # an empty table still needs one no-op partition (the API
        # requires at least one)
        return parts or [_FilePart(abs_path="")]

    def read(self, part):
        if not part.abs_path:
            return iter([])
        return _read_file_part(part, self.arrow_schema)


class _TableLogStreamReader(DataSourceStreamReader):
    """Offsets are snapshot ids: {"snapshot": n} means 'everything
    through snapshot n has been delivered'."""

    def __init__(self, schema, options):
        self.path = options["path"]
        self.ignore_rewrites = options.get("ignorerewrites", "false") == "true"
        self.start_snapshot = int(options.get("startingsnapshot", "-1"))
        self.schema = schema
        self.arrow_schema = _arrow_schema(schema)

    def initialOffset(self) -> dict:
        return {"snapshot": self.start_snapshot}

    def latestOffset(self) -> dict:
        snaps = tl._list_snapshots(self.path)
        return {"snapshot": snaps[-1] if snaps else -1}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["snapshot"], end["snapshot"]
        if hi <= lo:
            return [_FilePart(abs_path="")]
        want = [
            (f.name, json.loads(f.json())["type"]) for f in self.schema.fields
        ]

        def inspect(s, m, kind):
            # Delta-style schema-change stop: a snapshot in the range
            # whose committed contract differs from the QUERY's schema
            # stops the stream — explicit alters, an append whose
            # additive union evolved the schema, AND a rewrite that
            # changed it (e.g. overwrite with a new column): silently
            # conforming away the new column would lose data with no
            # retraction, and ignoreRewrites waives ROW changes, never
            # contract changes. A change that predates the stream — or a
            # restart that already picked it up — matches exactly and
            # passes.
            if (kind in ("metadata", "rewrite")
                    or (kind == "append" and m.get("schema_evolved"))):
                got = [
                    (f["name"], f["type"])
                    for f in json.loads(m["schema"])["fields"]
                ]
                if got != want:
                    raise ValueError(
                        f"snapshot {s} ({m['operation']}) changed the table "
                        "schema; restart the stream to pick up the new "
                        "contract (offsets are snapshot ids, so the "
                        "checkpoint remains valid; if the change predates "
                        "the offsets you need, start a fresh checkpoint "
                        "with option('startingSnapshot', ...))"
                    )

        new_files = tl.walk_appends(
            self.path, lo, hi,
            ignore_rewrites=self.ignore_rewrites, inspect=inspect,
        )
        end_m = tl._read_manifest(self.path, hi)
        parts = _file_partitions(self.path, end_m, new_files, self.schema)
        return parts or [_FilePart(abs_path="")]

    def read(self, part):
        if not part.abs_path:
            return iter([])
        return _read_file_part(part, self.arrow_schema)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing to clean up


@dataclass
class _StagedFiles(WriterCommitMessage):
    """Absolute paths of the parquet files one worker staged under the
    table's _staging/ dir."""

    staged: list = field(default_factory=list)


class _TableLogWriterBase:
    """Worker-side write shared by the batch and streaming writers: each
    partition's rows become ONE staged parquet file (written via
    pyarrow, cast to the query schema); only the driver-side commit
    moves files into data/ and claims a manifest, so a failed task
    leaves nothing visible (vacuum's age-gated staging sweep collects
    the garbage). Destinations must be unpartitioned — hive-layout
    splitting inside arbitrary tasks is out of scope."""

    def __init__(self, schema, options):
        self.path = options["path"]
        self.schema = schema
        self.arrow_schema = _arrow_schema(schema)

    def write(self, iterator):
        import uuid

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(iterator)
        if not rows:
            return _StagedFiles(staged=[])
        pdf = pd.DataFrame(rows, columns=[f.name for f in self.schema.fields])
        table = pa.Table.from_pandas(
            pdf, schema=self.arrow_schema, preserve_index=False
        )
        token = uuid.uuid4().hex[:12]
        staging = os.path.join(self.path, "_staging", f"dsw-{token}")
        os.makedirs(staging, exist_ok=True)
        dest = os.path.join(staging, f"part-{token}.parquet")
        pq.write_table(table, dest)
        return _StagedFiles(staged=[dest])

    def _publish(self, messages, txn):
        """Driver-side: move every staged file into data/ and claim one
        append manifest (tl._append_loop — optimistic retry, additive
        schema evolution, idempotent txn skip). Creates the table when
        absent; a creation race falls back to a plain append."""
        staged = [f for m in messages if m is not None for f in m.staged]
        token = None
        rels = []
        for src in staged:
            if token is None:
                import uuid

                token = uuid.uuid4().hex[:12]
            data_dir = tl._data_dir(self.path)
            os.makedirs(data_dir, exist_ok=True)
            final = os.path.join(data_dir, f"{token}-{os.path.basename(src)}")
            os.rename(src, final)
            rels.append(os.path.relpath(final, self.path))
        rels.sort()
        schema_json = self.schema.json()
        if not tl._list_snapshots(self.path):
            try:
                tl._commit(
                    self.path,
                    0,
                    tl._manifest(
                        "create", rels, schema_json, None,
                        {"txns": {txn[0]: txn[1]}} if txn else None,
                        file_stats=tl._collect_stats(self.path, rels),
                    ),
                )
                return
            except tl.CommitConflict:
                pass  # another first-writer won: append onto their table

        def placed(partition_by):
            if partition_by:
                raise ValueError(
                    "format('table_log') writer supports unpartitioned "
                    "destinations only; use table_log.append for "
                    "hive-partitioned tables"
                )
            return rels

        tl._append_loop(self.path, placed, schema_json, txn)

    def _abort(self, messages):
        for m in messages:
            if m is None:
                continue
            for f in m.staged:
                try:
                    os.unlink(f)
                except FileNotFoundError:
                    pass


class _TableLogStreamWriter(_TableLogWriterBase, DataSourceStreamWriter):
    """spark.writeStream.format("table_log"): every micro-batch commits
    as ONE snapshot with txn=(writer id, batchId), so a replayed batch
    after a crash is skipped by the append idempotency contract —
    exactly-once end to end, the native-sink twin of
    table_log.foreach_batch_appender."""

    def __init__(self, schema, options):
        super().__init__(schema, options)
        self.writer_id = options.get("writerid", f"dsw:{self.path}")

    def commit(self, messages, batchId) -> None:
        self._publish(messages, (self.writer_id, batchId))

    def abort(self, messages, batchId) -> None:
        self._abort(messages)


class _TableLogBatchWriter(_TableLogWriterBase, DataSourceWriter):
    """spark.read...write.format("table_log").mode("append"): one
    atomic append snapshot. Overwrite mode is intentionally unsupported
    (it needs the table_log.overwrite contract — evolution-metadata
    reset — on a DataFrame; use the API)."""

    def commit(self, messages) -> None:
        self._publish(messages, None)

    def abort(self, messages) -> None:
        self._abort(messages)


class TableLogDataSource(DataSource):
    """`spark.dataSource.register(TableLogDataSource)` then
    `spark.read.format("table_log").load(path)` /
    `spark.readStream.format("table_log").load(path)`."""

    @classmethod
    def name(cls) -> str:
        return "table_log"

    def schema(self):
        snaps = tl._list_snapshots(self.options["path"])
        if not snaps:
            raise ValueError(f"no table at {self.options['path']}")
        snap = _resolve_snapshot(self.options)
        m = tl._read_manifest(self.options["path"], snaps[-1] if snap is None else snap)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        # all-nullable: schema evolution means files written before a
        # column existed null-fill it, regardless of how the committing
        # DataFrame declared nullability
        return T.StructType(
            [T.StructField(f.name, f.dataType, True, f.metadata)
             for f in schema.fields]
        )

    def reader(self, schema):
        return _TableLogBatchReader(schema, self.options)

    def streamReader(self, schema):
        return _TableLogStreamReader(schema, self.options)

    def writer(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError(
                "mode('overwrite') is unsupported; use table_log.overwrite "
                "(it owns the evolution-metadata reset contract)"
            )
        return _TableLogBatchWriter(schema, self.options)

    def streamWriter(self, schema, overwrite: bool):
        return _TableLogStreamWriter(schema, self.options)


def register(spark) -> None:
    """Idempotent registration of the ``table_log`` format."""
    spark.dataSource.register(TableLogDataSource)
