"""Warehouse maintenance operators: incremental latest-state refresh and
small-file compaction — the operational pieces a continuously-ingesting
warehouse needs (ClickHouse gets both from MergeTree merges; parquet
needs explicit jobs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ravelytics_spark.operators.latest_state import latest_state


def merge_latest_state(
    current: DataFrame, updates: DataFrame, key: str, ts: str
) -> DataFrame:
    """Incremental refresh of a latest-state table (SURVEY §4's optional
    'incremental MERGE' rewrite): instead of re-aggregating all history,
    fold a new batch into the existing one-row-per-key state.

    ``current`` is the materialized latest-state (one row per key);
    ``updates`` is the new raw batch (any rows per key). Both must share
    the schema. Union → max_by is correct because latest-state is
    idempotent and associative: latest(latest(A), B) = latest(A ∪ B).
    Cost: one shuffle over (current ∪ batch), i.e. O(keys + batch) —
    not O(history).
    """
    value_cols = [c for c in current.columns if c not in (key, ts)]
    return latest_state(
        current.unionByName(updates.select(*current.columns)),
        key=key,
        ts=ts,
        value_cols=value_cols,
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    partitions: list[str] | None = None,
    target_file_rows: int = 1_000_000,
) -> None:
    """Small-file compaction for a streaming parquet sink: each
    micro-batch appends a file per task, so a long-running ingest leaves
    thousands of small files per partition (the classic streaming-sink
    pathology; MergeTree background merges are ClickHouse's answer).

    Rewrites each listed partition (default: all) into
    ``ceil(rows / target_file_rows)`` files via a staging dir + atomic
    rename. At 100 TB this runs per-partition on a schedule, touching
    only partitions past their ingest window.
    """
    import math
    import shutil

    if partitions is None:
        partitions = [
            d.split("=", 1)[1]
            for d in os.listdir(path)
            if d.startswith(f"{partition_col}=")
        ]
    for value in partitions:
        part_dir = os.path.join(path, f"{partition_col}={value}")
        df = spark.read.parquet(part_dir)
        n = df.count()
        files = max(1, math.ceil(n / target_file_rows))
        staging = part_dir + ".compacting"
        df.repartition(files).write.mode("overwrite").parquet(staging)
        shutil.rmtree(part_dir)
        os.rename(staging, part_dir)


def cleanse_tracks_with_audit(wire: DataFrame) -> DataFrame:
    """Cleansing with defaulting-audit flags (dead-letter-queue pattern):
    same output as ``cleanse_tracks`` plus booleans recording which
    fallbacks fired, so bad upstream data is measurable instead of
    silently defaulted (the reference's MV swallows these, 001:54-72).
    Route ``filter(any flag)`` to a quarantine sink for inspection.
    """
    from ravelytics_spark.plans.tracks_pipeline import cleanse_tracks

    cleaned = cleanse_tracks(wire)
    audit_src = wire.select(
        "track_id",
        F.col("ingest_ts").alias("__raw_ingest_ts"),
        F.col("release_date").alias("__raw_release_date"),
        F.col("added_at").alias("__raw_added_at"),
    )
    flags = audit_src.select(
        "track_id",
        F.try_to_timestamp(F.col("__raw_ingest_ts")).isNull().alias("ingest_ts_defaulted"),
        (
            F.try_to_date(
                F.when(
                    (F.length("__raw_release_date") == 4)
                    & F.col("__raw_release_date").rlike(r"^[0-9]{4}$"),
                    F.concat(F.col("__raw_release_date"), F.lit("-01-01")),
                ).otherwise(F.substring("__raw_release_date", 1, 10)),
                "yyyy-MM-dd",
            ).isNull()
        ).alias("release_date_defaulted"),
        F.try_to_timestamp(F.col("__raw_added_at")).isNull().alias("added_at_defaulted"),
    )
    return cleaned.join(flags, "track_id", "left")
