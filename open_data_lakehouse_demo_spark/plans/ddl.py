"""DDL / catalog operations (SURVEY.md §2.1 S13-S14, §2.10 M1-M3).

Reference surface → Spark SQL:
  CTAS (+ Iceberg OPTIONS)      part0:255-272, part3:124-157  → ctas()
  CREATE TABLE (cols)           part1:231-250                 → create_table()
  DROP TABLE IF EXISTS          part1:279                     → drop_table()
  DELETE FROM t WHERE ...       part1:566-589, bq_service:97  → delete_where()
  CREATE NAMESPACE / USE        part1:497-498                 → namespace ops
  SHOW TABLES / DESCRIBE        part2:206-216                 → show_tables()/
                                                                describe_table()
  EXPORT TABLE METADATA         part1:333, 606                → no-op (Iceberg
                                commits are always current; S16)

Format strategy: Iceberg when its runtime is on the classpath (ACID
DELETE/MERGE, snapshots, schema evolution), else managed Parquet tables
with a documented read-filter-overwrite DELETE fallback (correct but not
concurrent-writer-safe — the Iceberg path is the production one).

For path-addressed tables that need the ICEBERG CONTRACTS without the
jar — atomic commits, snapshot-isolated reads, time travel, rollback,
additive schema evolution, optimistic concurrency —
``sources/table_log.py`` provides a native manifest-log table format
(the Iceberg/Delta metadata pattern over immutable parquet + one atomic
link(2) commit per snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from open_data_lakehouse_demo_spark.sources.io import table_format


def create_namespace(spark: SparkSession, name: str) -> None:
    """M3: CREATE NAMESPACE IF NOT EXISTS (ref part1:497)."""
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {name}")


def use_namespace(spark: SparkSession, name: str) -> None:
    """M3: USE ns (ref part1:498)."""
    spark.sql(f"USE {name}")


def show_tables(spark: SparkSession, namespace: str | None = None) -> DataFrame:
    """M1: SHOW TABLES [FROM ns] (ref part2:206)."""
    return spark.sql(f"SHOW TABLES FROM {namespace}" if namespace else "SHOW TABLES")


def describe_table(spark: SparkSession, table: str) -> DataFrame:
    """M2: DESCRIBE TABLE EXTENDED (ref part2:210-216)."""
    return spark.sql(f"DESCRIBE TABLE EXTENDED {table}")


def create_table(spark: SparkSession, table: str, columns_ddl: str, partitioned_by: str | None = None) -> None:
    """S14: explicit-schema CREATE TABLE (ref part1:231-250). The
    ``partitioned_by`` transform (e.g. ``days(ts)`` on Iceberg) carries the
    reference's CLUSTER BY intent (S15) so time predicates prune files."""
    fmt = table_format(spark)
    part = f" PARTITIONED BY ({partitioned_by})" if partitioned_by else ""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {table} ({columns_ddl}) USING {fmt}{part}")


def ctas(spark: SparkSession, table: str, select_sql: str) -> None:
    """S13: CREATE OR REPLACE TABLE AS SELECT (ref part0:255-272 etc.).

    The SELECT runs through Catalyst like any query; the write inherits
    AQE's coalesced output partitioning (no tiny-files explosion).
    Iceberg supports atomic CREATE OR REPLACE; the V1 parquet catalog
    doesn't, so that path drops first (single-writer, like its DELETE)."""
    fmt = table_format(spark)
    if fmt == "iceberg":
        spark.sql(f"CREATE OR REPLACE TABLE {table} USING {fmt} AS {select_sql}")
    else:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"CREATE TABLE {table} USING {fmt} AS {select_sql}")


def ctas_from_df(df: DataFrame, table: str, mode: str = "overwrite") -> None:
    """S5/S8: DataFrame → managed table (ref part1:506-508 saveAsTable)."""
    fmt = table_format(df.sparkSession)
    df.write.format(fmt).mode(mode).saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    """S14: DROP TABLE IF EXISTS (ref part1:279)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def delete_where(spark: SparkSession, table: str, condition: str) -> int:
    """S14: DELETE FROM t WHERE cond (ref part1:584-589 'WHERE TRUE'
    truncate, bq_service.py:97 'WHERE 1=1').

    Iceberg: native ACID DELETE. Parquet fallback: read → anti-filter →
    copy-on-write rewrite + atomic catalog swap (_rewrite_swap;
    single-writer only — documented limitation). Returns the number of
    rows deleted."""
    before = spark.table(table).count()
    if table_format(spark) == "iceberg":
        spark.sql(f"DELETE FROM {table} WHERE {condition}")
    else:
        _rewrite_swap(
            spark, table, spark.table(table).filter(f"NOT ({condition})"), "delete"
        )
    return before - spark.table(table).count()


def truncate(spark: SparkSession, table: str) -> int:
    """DELETE FROM t WHERE TRUE (ref part1:584-589)."""
    return delete_where(spark, table, "TRUE")


def alter_add_column(spark: SparkSession, table: str, column: str, dtype: str) -> None:
    """ALTER TABLE ADD COLUMNS (the catalog-table face of schema
    evolution; path-addressed logged tables get the same op from
    sources/table_log.py add_column). Metadata-only on every format:
    parquet reads resolve columns by name, so files lacking the new
    column scan as NULL — same contract as Iceberg's add."""
    spark.sql(f"ALTER TABLE {table} ADD COLUMNS ({column} {dtype})")


def _rewrite_swap(spark: SparkSession, table: str, df: DataFrame, suffix: str) -> None:
    """Copy-on-write rewrite + atomic catalog swap (the same fallback
    pattern as delete_where/merge_into): write df to a NEW table
    location, then swap names — old files stay readable during the
    write, single-writer only (documented V1-parquet limitation)."""
    tmp = f"{table}__tmp_{suffix}"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    df.write.format("parquet").saveAsTable(tmp)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
    spark.catalog.refreshTable(table)


def alter_rename_column(spark: SparkSession, table: str, old: str, new: str) -> None:
    """ALTER TABLE RENAME COLUMN. Iceberg: metadata-only (field-id
    rename). V1 parquet catalog tables can't rename in place (the files
    store the old name and parquet resolves by name), so the fallback
    rewrites copy-on-write + catalog swap. Path-addressed logged tables
    get the metadata-only version from table_log.rename_column."""
    if table_format(spark) == "iceberg":
        spark.sql(f"ALTER TABLE {table} RENAME COLUMN {old} TO {new}")
        return
    _rewrite_swap(spark, table, spark.table(table).withColumnRenamed(old, new), "rename")


def alter_widen_column(spark: SparkSession, table: str, column: str, dtype: str) -> None:
    """ALTER TABLE ALTER COLUMN TYPE, restricted to Iceberg's safe
    promotions (int→long, float→double — widenings the parquet reader
    performs in place). Iceberg: metadata-only. V1 parquet fallback:
    copy-on-write cast + catalog swap."""
    cur = dict(spark.table(table).dtypes)[column]
    allowed = {("int", "bigint"), ("float", "double")}
    if (cur, dtype) not in allowed:
        raise ValueError(
            f"cannot widen {column!r} {cur} -> {dtype}; allowed: {sorted(allowed)}"
        )
    if table_format(spark) == "iceberg":
        spark.sql(f"ALTER TABLE {table} ALTER COLUMN {column} TYPE {dtype}")
        return
    df = spark.table(table)
    _rewrite_swap(
        spark, table, df.withColumn(column, df[column].cast(dtype)), "widen"
    )


def alter_drop_column(spark: SparkSession, table: str, column: str) -> None:
    """ALTER TABLE DROP COLUMN. Iceberg: metadata-only. V1 parquet
    fallback: copy-on-write projection + catalog swap."""
    if table_format(spark) == "iceberg":
        spark.sql(f"ALTER TABLE {table} DROP COLUMN {column}")
        return
    _rewrite_swap(spark, table, spark.table(table).drop(column), "drop")


def merge_into(
    spark: SparkSession,
    target_table: str,
    source: DataFrame,
    on: list[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
) -> dict[str, int]:
    """MERGE INTO (upsert) — the lakehouse mutation the reference's
    per-batch full-overwrite sink (pyspark-job.py:56-69) approximates.

    Iceberg: native `MERGE INTO ... WHEN MATCHED ... WHEN NOT MATCHED`.
    Parquet fallback: copy-on-write — anti-join keeps unmatched target
    rows, matched rows are replaced (update) or kept (ignore), source-only
    rows appended (insert) — then the same atomic catalog swap as
    delete_where. Fully distributed: two hash joins on the merge key, no
    driver materialization. Returns {"updated": n, "inserted": n}.

    ``when_matched``: 'update' (replace row with source) | 'ignore'.
    ``when_not_matched``: 'insert' | 'ignore'.
    """
    if when_matched not in ("update", "ignore") or when_not_matched not in ("insert", "ignore"):
        raise ValueError("when_matched ∈ {update,ignore}; when_not_matched ∈ {insert,ignore}")
    target = spark.table(target_table)
    if set(source.columns) != set(target.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} vs source {sorted(source.columns)}"
        )
    source = source.select(*target.columns)  # align column order

    if table_format(spark) == "iceberg":
        source.createOrReplaceTempView("__merge_source")
        cond = " AND ".join(f"t.{k} = s.{k}" for k in on)
        matched = (
            "WHEN MATCHED THEN UPDATE SET *" if when_matched == "update" else ""
        )
        not_matched = (
            "WHEN NOT MATCHED THEN INSERT *" if when_not_matched == "insert" else ""
        )
        n_match = source.join(target, on, "left_semi").count()
        n_new = source.join(target, on, "left_anti").count()
        spark.sql(
            f"MERGE INTO {target_table} t USING __merge_source s ON {cond} "
            f"{matched} {not_matched}"
        )
        return {
            "updated": n_match if when_matched == "update" else 0,
            "inserted": n_new if when_not_matched == "insert" else 0,
        }

    kept = target.join(source.select(*on), on, "left_anti")
    pieces = [kept]
    n_updated = n_inserted = 0
    matched_src = source.join(target.select(*on), on, "left_semi")
    unmatched_src = source.join(target.select(*on), on, "left_anti")
    if when_matched == "update":
        pieces.append(matched_src)
        n_updated = matched_src.count()
    else:
        pieces.append(target.join(source.select(*on), on, "left_semi"))
    if when_not_matched == "insert":
        pieces.append(unmatched_src)
        n_inserted = unmatched_src.count()
    merged = pieces[0]
    for p in pieces[1:]:
        merged = merged.unionByName(p)
    tmp = f"{target_table}__tmp_merge"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    merged.write.format("parquet").saveAsTable(tmp)
    spark.sql(f"DROP TABLE {target_table}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {target_table}")
    spark.catalog.refreshTable(target_table)
    return {"updated": n_updated, "inserted": n_inserted}
