"""Sources and sinks: parquet/json readers, latest-file selection, Kafka
(gated), binary-file multimodal ingestion."""

from ravelytics_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["TABLE_NAMES", "load_table", "load_tables"]
