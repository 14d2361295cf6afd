"""SparkSession factory.

One session, one catalog, replaces all three data planes of the reference
(BigQuery managed tables, REST-catalog Iceberg, BQ-connector reads — see
SURVEY.md §1.1, reference lakehouse_part2_spark_processing.py:139-196).

Scale notes (targets a 1000-executor cluster even though tests run
local[N]):
  - AQE on: runtime coalescing, skew-join splitting, dynamic join strategy.
  - shuffle.partitions is a *local* default; at cluster scale AQE
    coalesces from a high initial number, so we set
    ``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` high and
    let AQE shrink rather than hand-tune per query.
  - Arrow enabled for every pandas interchange (grouped-map UDFs are the
    only Python hot path; everything else stays JVM-side).
  - session timezone pinned to UTC so timestamp semantics match the
    ANSI/DuckDB oracle exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "open_data_lakehouse_demo_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    local[cpus] for tests/bench; on a real cluster the master/memory knobs
    come from spark-submit and everything here still applies.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # -- planner ----------------------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalesces small shuffles down to ~bytes/minPartitionSize
        # partitions (parallelismFirst only consults this floor). The 1m
        # default caps a stage whose shuffle is byte-light but CPU-dense
        # (candidate-pair verification, array intersections, UNNEST
        # fan-outs) at totalBytes/1m partitions — measured 5 partitions
        # on 32 cores for containment verification. The floor only binds
        # when a stage shuffles < cores × this size, i.e. exactly the
        # byte-light stages; real data-heavy shuffles at cluster scale
        # sit far above either value, so lowering it is scale-neutral.
        # Interleaved A/B at sf0.1 (tools/ab_config.py, r13): 256k gives
        # containment_dups 0.48×, minute_fanout 0.54×, ngram 0.76× with
        # the vector top-k family flat-to-better; 64k overshoots (window
        # stages fragment). Env-overridable for cluster tuning.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "256k"),
        )
        .config("spark.sql.shuffle.partitions", str(cpus))
        # -- python interchange -----------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Python DataSource filter pushdown (Spark 4.1): lets the
        # format("table_log") reader's option("pushdown","true") variant
        # prune files from manifest stats; harmless otherwise
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # -- semantics ---------------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # INT64 micros, not legacy INT96: INT96 carries NO parquet
        # column statistics, which blinds footer-stats file skipping
        # (table_log scan planning, layout.py skip audits) on every
        # timestamp column; int64-micros is also what Iceberg/Delta
        # write. (Found r7: a table_log timestamp-pruning test saw
        # statistics=None on the ts column.)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # ANSI off: GoogleSQL's SAFE_ functions are the compat layer's job
        .config("spark.sql.ansi.enabled", "false")
        # -- local-mode ergonomics ---------------------------------------
        # local mode runs all executor work inside the driver JVM — size it
        # for the box (32 threads × shuffle/agg buffers + checkpoint blocks;
        # 8g showed late-suite GC pressure on long query sequences)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
