"""open_data_lakehouse_demo_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
surface of GoogleCloudPlatform/open-data-lakehouse-demo (studied read-only at
/root/reference; see SURVEY.md). Everything the reference delegates to
BigQuery GoogleSQL or Dataproc Spark is re-hosted on a single self-contained
PySpark engine: DataFrame/SQL plans optimized by Catalyst, executed by
Tungsten, with Structured Streaming for the streaming surface.

Layout:
  session    — SparkSession factory tuned for local[N] and cluster scale
  sources    — IO: parquet/csv/jsonl readers & writers, table registry, DDL
  functions  — GoogleSQL-compat scalar function layer (safe_divide, ...)
  operators  — relational operators Spark lacks natively (gap_fill, dedup,
               similarity search, text analysis, multimodal plumbing)
  plans      — the named query inventory (SURVEY.md §2) with DuckDB oracles
  pipelines  — batch pipelines (ride simulation: U1/U2 seeded UDFs)
  streaming  — the streaming job topology (alerts + stateful bus state)
"""

__version__ = "0.1.0"

from open_data_lakehouse_demo_spark.session import get_spark  # noqa: F401
