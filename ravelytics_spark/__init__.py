"""ravelytics_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``bobbobylev/ravelytics`` (a music-analytics ETL/ELT stack: Airflow DAGs →
Kafka → ClickHouse MergeTree + SQL views → Superset), re-expressed Spark-first:

- DataFrame/SQL logical plans, Catalyst/AQE optimization, Parquet at rest;
- Structured Streaming for the Kafka → warehouse leg;
- native column expressions (no row-at-a-time Python UDFs on hot paths);
- extension operators for large-scale training-data pipelines
  (dedup, similarity search, multimodal columns, text analysis).

See SURVEY.md for the operator inventory this package implements.
"""

__version__ = "0.1.0"
