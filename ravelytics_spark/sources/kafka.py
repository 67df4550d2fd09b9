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

Topic admin (OP-S10): ``ensure_topic`` mirrors the reference's inline
create-if-missing (spotify_artist_genres_to_kafka.py:60-72) over an
injected AdminClient-shaped object — no kafka library import here; the
production binding passes ``kafka.admin.KafkaAdminClient`` (or
confluent's AdminClient behind the same three methods), tests pass a
fake.
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ravelytics_spark.schemas import TRACKS_WIRE_SCHEMA


class TopicAdmin(Protocol):
    """The slice of kafka AdminClient that topic admin needs."""

    def list_topics(self) -> list[str]: ...  # pragma: no cover - protocol

    def create_topic(
        self, name: str, num_partitions: int, replication_factor: int
    ) -> None: ...  # pragma: no cover - protocol


def ensure_topic(
    admin: TopicAdmin,
    topic: str,
    num_partitions: int = 1,
    replication_factor: int = 1,
) -> bool:
    """OP-S10 create-if-missing, matching the reference DAG's semantics
    (spotify_artist_genres_to_kafka.py:60-72: list topics, create with
    partitions/RF only when absent; existing topics are left untouched).
    Returns True if the topic was created, False if it already existed.

    Races (two ingest jobs creating the same topic) surface as the
    broker's TopicAlreadyExists error from ``create_topic``; treat it as
    the False path in callers — same as the reference, which tolerates
    the error by checking existence first and accepting the tiny window.
    """
    if topic in set(admin.list_topics()):
        return False
    admin.create_topic(topic, num_partitions, replication_factor)
    return True


def to_kafka_records(
    df: DataFrame,
    key_col: str | None = None,
    keep_key_in_value: bool = False,
) -> DataFrame:
    """Serialize rows to the Kafka wire shape: value = JSON of all
    columns (JSONEachRow), optional key for per-key ordering/compaction.

    Unkeyed (tracks, OP-S5): round-robin partitioning, order not
    guaranteed across partitions — the downstream views tolerate that
    (argMax / group-by-ingest_ts).
    Keyed (artists, OP-S6): key=artist_id keeps each artist's updates in
    one partition → per-artist ordering for the latest-state view.
    ``keep_key_in_value=True`` reproduces the reference's artists wire
    layout exactly (spotify_artist_genres_to_kafka.py:126-127: the
    record keeps artist_id in the JSON value AND sends it as the key);
    the default drops the key from the payload (no duplication) for
    consumers that read the key column.
    """
    payload_cols = [
        c for c in df.columns if keep_key_in_value or c != key_col
    ]
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


def parse_artists_wire(kafka_df: DataFrame, key_in_value: bool = False) -> DataFrame:
    """Inverse of ``to_kafka_records`` for the keyed artists topic: the
    Kafka-engine table's JSONEachRow parse of the value, with the
    artist_id recovered from the VALUE when the producer duplicated it
    (the reference layout, spotify_artist_genres_to_kafka.py:126-127)
    or from the message KEY for the no-duplication layout
    (``keep_key_in_value=False``), so either wire round-trips to the
    same typed rows. The default mirrors ``to_kafka_records``'s
    ``keep_key_in_value=False`` so producing and parsing with defaults
    agree on the layout (ADVICE r10: the old ``True`` default silently
    yielded NULL artist_id against a default-produced wire)."""
    from ravelytics_spark.schemas import ARTISTS_WIRE_SCHEMA

    parsed = kafka_df.select(
        F.col("key").cast("string").alias("_key"),
        F.from_json(
            F.col("value").cast("string"), ARTISTS_WIRE_SCHEMA
        ).alias("r"),
    )
    if key_in_value:
        return parsed.select("r.*")
    cols = [
        F.coalesce(F.col("r.artist_id"), F.col("_key")).alias("artist_id")
        if f.name == "artist_id"
        else F.col(f"r.{f.name}")
        for f in ARTISTS_WIRE_SCHEMA.fields
    ]
    return parsed.select(*cols)


class WireProducer(Protocol):
    """The slice of a Kafka producer that delivery accounting needs
    (confluent_kafka.Producer shape: produce with a delivery callback,
    flush returning the count still undelivered)."""

    def produce(
        self, topic: str, value: bytes, key: bytes | None = None, callback=None
    ) -> None: ...  # pragma: no cover - protocol

    def flush(self, timeout: float) -> int: ...  # pragma: no cover - protocol


def produce_records(
    producer: WireProducer,
    records: list[tuple[bytes | None, bytes]],
    topic: str,
    flush_timeout: float = 10.0,
    max_retries: int = 0,
) -> dict:
    """Driver-side produce with the reference's delivery-callback
    accounting and fail-on-error contract
    (spotify_metadata_to_kafka.py:52-70: count deliveries via callback,
    flush, raise RuntimeError listing the first 3 errors), hardened on
    the two paths the reference leaves silent:

    - **partial flush**: the reference ignores ``flush``'s return value,
      so messages still queued after the timeout are neither counted
      delivered nor raised — a silent undercount. Here any pending
      count > 0 after the final flush raises, and the pending number is
      part of the accounting.
    - **retry accounting**: transient per-message failures can be
      retried up to ``max_retries`` full passes; every attempt is
      counted (``attempts``), and only messages that fail their final
      attempt raise. The reference's implicit librdkafka retries are
      invisible to its counter; this makes them auditable.

    ``records`` are (key, value) byte pairs — the wire layout
    ``to_kafka_records`` produces. Returns the accounting dict
    ``{"delivered": n, "attempts": n, "retried": n}`` on full success.
    This is the DAG-task analog for bounded driver-side batches (the
    reference produces one fetched playlist page per run); the
    distributed path stays ``write_batch`` (the Spark connector owns
    delivery accounting there).
    """
    delivered = 0
    attempts = 0
    retried = 0
    pending = list(records)
    last_errors: list[str] = []
    for attempt in range(max_retries + 1):
        failed: list[tuple[bytes | None, bytes]] = []
        errors: list[str] = []

        def _cb(err, rec):
            nonlocal delivered
            if err is None:
                delivered += 1
            else:
                errors.append(str(err))
                failed.append(rec)

        for rec in pending:
            key, value = rec
            attempts += 1
            producer.produce(
                topic,
                value,
                key=key,
                callback=(lambda err, msg, rec=rec: _cb(err, rec)),
            )
        still_queued = producer.flush(flush_timeout)
        if still_queued:
            raise RuntimeError(
                f"Kafka flush timeout: {still_queued} message(s) still "
                f"undelivered after {flush_timeout}s (delivered "
                f"{delivered}, failed {len(failed)})"
            )
        last_errors = errors
        if not failed:
            return {
                "delivered": delivered,
                "attempts": attempts,
                "retried": retried,
            }
        retried += len(failed)
        pending = failed
    raise RuntimeError(
        f"Kafka delivery errors after {max_retries + 1} attempt(s) "
        f"({len(pending)} message(s) undeliverable): {last_errors[:3]}"
    )
