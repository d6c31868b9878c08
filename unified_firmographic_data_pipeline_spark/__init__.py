"""unified_firmographic_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (rgliszi95/unified-firmographic-data-pipeline,
an Airflow + Snowflake + dbt ETL stack — see SURVEY.md). Everything here is
built on the public PySpark DataFrame / SQL / Structured Streaming API:

- ``session``    — SparkSession factory (UTC, AQE, Arrow).
- ``functions``  — scalar ``Column -> Column`` expression builders (the dbt
  macro analogues: money/pct parsing, surrogate keys, text & vector math).
- ``operators``  — engine operators: json flatten, window dedup, SCD2 merge,
  incremental watermark/upsert, near-dup (MinHash/SimHash), similarity search.
- ``sources``    — landing readers (glob-filtered JSON + metadata stamping),
  table catalog, multimodal binary-column plumbing.
- ``plans``      — the model-graph runner and the firmographic pipeline models
  (staging -> core -> snapshots -> star), the dbt-DAG analogue.
- ``streaming``  — Structured Streaming ingest / windowed aggregation.
- ``quality``    — the declarative data-test suite (dbt test analogue).
"""

__version__ = "0.1.0"
