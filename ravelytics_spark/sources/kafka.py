"""Kafka sinks/sources (SURVEY OP-S5/S6/S7/S10).

The reference produces JSON messages per record — unkeyed for tracks
(spotify_metadata_to_kafka.py:52-70), keyed by artist_id for artists
(spotify_artist_genres_to_kafka.py:113-132, key at :126-127) — and
consumes via a ClickHouse Kafka-engine table (001:25-47).

Spark-native mapping: ``to_json(struct(*))`` → the kafka batch/stream
connector. These builders only PREPARE the plan; ``.save()`` /
``.start()`` needs a broker plus the spark-sql-kafka package, neither of
which exists in this container — the wire-format builders are what the
harness tests (golden byte layouts), and ``write_batch``/``read_stream``
are thin, documented one-liners over them.

Topic admin (OP-S10) is deliberately NOT a Spark op: create topics with
kafka AdminClient in deployment code (the reference does it inline in
the DAG, spotify_artist_genres_to_kafka.py:60-72).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ravelytics_spark.schemas import TRACKS_WIRE_SCHEMA


def to_kafka_records(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Serialize rows to the Kafka wire shape: value = JSON of all
    columns (JSONEachRow), optional key for per-key ordering/compaction.

    Unkeyed (tracks, OP-S5): round-robin partitioning, order not
    guaranteed across partitions — the downstream views tolerate that
    (argMax / group-by-ingest_ts).
    Keyed (artists, OP-S6): key=artist_id keeps each artist's updates in
    one partition → per-artist ordering for the latest-state view.
    """
    payload_cols = [c for c in df.columns if c != key_col]
    value = F.to_json(F.struct(*payload_cols)).alias("value")
    if key_col is None:
        return df.select(value)
    return df.select(F.col(key_col).cast("string").alias("key"), value)


def write_batch(df: DataFrame, bootstrap: str, topic: str, key_col: str | None = None) -> None:
    """Batch produce (the DAG task analog). Delivery accounting
    (ref :52-61) is the connector's job: the write fails the Spark job on
    unacknowledged sends — same fail-on-error contract, without manual
    callback counting."""
    (
        to_kafka_records(df, key_col)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )


def parse_tracks_wire(kafka_df: DataFrame) -> DataFrame:
    """Inverse of ``to_kafka_records`` for the tracks topic: the
    Kafka-engine table's JSONEachRow parse (001:25-47)."""
    return kafka_df.select(
        F.from_json(F.col("value").cast("string"), TRACKS_WIRE_SCHEMA).alias("r")
    ).select("r.*")
