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
    min_quiesce_s: float = 0.0,
) -> None:
    """Small-file compaction for a parquet warehouse: a long-running
    ingest leaves thousands of small files per partition (the classic
    streaming-sink pathology; MergeTree background merges are
    ClickHouse's answer).

    Rewrites each listed partition (default: all) into
    ``ceil(rows / target_file_rows)`` files via staging dir +
    rename-swap: the live dir is moved aside only AFTER the compacted
    copy is fully written, then staging is promoted, then the old copy
    is deleted LAST — a crash at any step leaves a complete copy of the
    data on disk (the old dir, recoverable by renaming back).

    Concurrency contract: a partition must be quiescent while it is
    compacted — rows appended between the read and the swap would be
    lost. ``min_quiesce_s`` enforces this programmatically: partitions
    containing a file modified more recently than that many seconds ago
    are skipped (run with e.g. 2× the micro-batch interval; ingest-day
    partitions simply wait for the next scheduled pass).

    Filesystem contract: the staging/retire swap depends on atomic
    directory ``os.rename`` and driver-visible listings, i.e. a POSIX
    filesystem (local disk, NFS). On object stores (S3) rename is
    copy+delete and non-atomic — there, compact through a table format
    (Delta/Iceberg ``rewrite_data_files``) instead of this operator.

    NOT for paths under a Structured Streaming file-sink root: the
    sink's ``_spark_metadata`` transaction log names the original part
    files, and readers of the sink root prefer the log — rewritten
    files would be invisible/dangling. Such sinks must be compacted
    through the sink's own commit protocol or a table format
    (Delta/Iceberg ``rewrite_data_files``). Detected and refused.
    """
    import math
    import shutil
    import time

    if os.path.isdir(os.path.join(path, "_spark_metadata")):
        raise ValueError(
            f"{path} is a Structured Streaming file-sink root "
            "(_spark_metadata present); compacting part files here would "
            "invalidate the sink's transaction log. Use the sink's commit "
            "protocol or a table format instead."
        )
    if partitions is None:
        partitions = [
            d.split("=", 1)[1]
            for d in os.listdir(path)
            if d.startswith(f"{partition_col}=")
        ]
    now = time.time()
    for value in partitions:
        part_dir = os.path.join(path, f"{partition_col}={value}")
        if min_quiesce_s > 0:
            newest = max(
                (
                    os.path.getmtime(os.path.join(part_dir, f))
                    for f in os.listdir(part_dir)
                ),
                default=0.0,
            )
            if now - newest < min_quiesce_s:
                continue  # still inside the ingest window — next pass
        df = spark.read.parquet(part_dir)
        n = df.count()
        files = max(1, math.ceil(n / target_file_rows))
        staging = part_dir + ".compacting"
        retired = part_dir + ".retired"
        df.repartition(files).write.mode("overwrite").parquet(staging)
        os.rename(part_dir, retired)  # old data intact until promote succeeds
        os.rename(staging, part_dir)
        shutil.rmtree(retired)  # delete last; crash before this leaves both copies


def upsert_partitioned(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    key: str,
    ts: str,
    partition_col: str,
) -> list[str]:
    """Partition-pruned MERGE (upsert) into a hive-partitioned parquet
    warehouse: fold a delta batch into the latest-state table, rewriting
    ONLY the partitions the delta touches — the poor-man's Delta/Iceberg
    ``MERGE INTO`` for plain parquet. (ClickHouse gets this from
    ReplacingMergeTree background merges; the reference's tracks table
    relies on exactly that, 001_init_spotify_tracks.sql:6-22.)

    Per touched partition: read current rows, fold in the delta slice
    (union → max_by, keeping the winning timestamp — one shuffle over
    O(partition + slice), not O(table)), then promote via the same
    rename-swap as ``compact_partitions`` (staging written fully →
    live dir retired → staging promoted → retired deleted LAST; a
    crash at any step leaves a complete copy on disk). Untouched
    partitions are never read, written, or listed.

    Contract: ``partition_col`` must be immutable per key (true for
    any ingest-date/month derivation of a key-stable timestamp) — a
    key that changes partition value would duplicate across partitions
    because old partitions are not scanned. The delta must carry the
    table's exact schema. Returns the list of partition values
    rewritten.

    At 100 TB the touched-partition list is the day's ingest window
    (a handful of values), so the rewrite cost is bounded by ingest
    volume, never table size.
    """
    import shutil

    def _merge(df: DataFrame) -> DataFrame:
        # Unlike merge_latest_state (which emits only key + values), the
        # stored row RETAINS the winning timestamp — the next upsert
        # needs it to order current vs delta (ReplacingMergeTree keeps
        # the full row for the same reason).
        value_cols = [c for c in df.columns if c not in (key, ts)]
        return df.groupBy(key).agg(
            *[F.max_by(c, ts).alias(c) for c in value_cols],
            F.max(ts).alias(ts),
        )

    touched = [
        r[0]
        for r in delta.select(partition_col).distinct().collect()
    ]
    for value in sorted(str(v) for v in touched):
        part_dir = os.path.join(path, f"{partition_col}={value}")
        slice_df = delta.filter(F.col(partition_col) == value).drop(
            partition_col
        )
        if os.path.isdir(part_dir):
            current = spark.read.parquet(part_dir)
            merged = _merge(current.unionByName(slice_df.select(*current.columns)))
        else:
            merged = _merge(slice_df)
        staging = part_dir + ".upserting"
        retired = part_dir + ".retired"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.isdir(part_dir):
            os.rename(part_dir, retired)
            os.rename(staging, part_dir)
            shutil.rmtree(retired)
        else:
            os.rename(staging, part_dir)
    return sorted(str(v) for v in touched)


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
