"""Byte-layout contract tests for the Kafka wire path (OP-S5/S6).

No broker exists in this container, but confluent-kafka's
``Producer.produce(topic, value=..., key=...)`` sends the passed bytes
VERBATIM as the message payload (the wire protocol frames them, it
never rewrites them). So the producer contract is fully testable
broker-free: pin the exact (key, value) bytes our builders emit and
compare them against what the reference DAGs hand to confluent-kafka —

* tracks topic: ``json.dumps(rec).encode("utf-8")``, unkeyed
  (spotify_metadata_to_kafka.py:65)
* artists topic: ``json.dumps(r, ensure_ascii=False).encode("utf-8")``
  with ``key=r["artist_id"]`` (str keys are UTF-8-encoded by
  confluent-kafka; spotify_artist_genres_to_kafka.py:126-127)

Spark's ``to_json`` emits compact separators and raw UTF-8, i.e. the
canonical form ``json.dumps(rec, separators=(",", ":"),
ensure_ascii=False)``. For the artists topic that is byte-identical to
the reference modulo JSON-insignificant separator whitespace; for the
tracks topic the reference additionally \\u-escapes non-ASCII
(``ensure_ascii=True`` default). Both differences are invisible to the
consumer (ClickHouse JSONEachRow, 001_init_spotify_tracks.sql:25-47).
The tests therefore assert BOTH levels: exact byte equality against
the canonical compact encoding (our layout, frozen), and parse-level
equality against the reference's exact bytes (the interop contract)."""

from __future__ import annotations

import json

from ravelytics_spark.schemas import ARTISTS_WIRE_SCHEMA, TRACKS_WIRE_SCHEMA
from ravelytics_spark.sources.kafka import to_kafka_records

# Tricky content on purpose: non-ASCII (BMP + combining), quotes,
# backslash, newline, empty array, zero ints.
TRACK_RECS = [
    {
        "ingest_ts": "2025-07-30T09:27:45Z",
        "track_id": "t1",
        "track_name": 'Sign "o\\" the\nTimes',
        "artists": ["Björk", "Мумий Тролль"],
        "artist_ids": ["a1", "a2"],
        "album_id": "al1",
        "album_name": "Début",
        "release_date": "1993-07-05",
        "popularity": 62,
        "added_at": "2025-07-30T09:27:45Z",
        "external_url": "https://open.spotify.com/track/t1",
    },
    {
        "ingest_ts": "2025-07-30T09:27:45Z",
        "track_id": "t2",
        "track_name": "",
        "artists": [],
        "artist_ids": [],
        "album_id": "",
        "album_name": "",
        "release_date": "1970-01-01",
        "popularity": 0,
        "added_at": "2025-07-30T09:27:45Z",
        "external_url": "",
    },
]

ARTIST_RECS = [
    {
        "ingest_ts": "2025-07-30T09:27:45Z",
        "artist_id": "a1",
        "artist_name": "Björk",
        "genres": ["art pop", "electronic"],
        "popularity": 75,
        "followers_total": 5864310,
    },
    {
        "ingest_ts": "2025-07-30T09:27:45Z",
        "artist_id": "a2",
        "artist_name": "Мумий Тролль",
        "genres": [],
        "popularity": 0,
        "followers_total": 0,
    },
]


def _canonical(rec: dict) -> bytes:
    """The compact UTF-8 JSON encoding Spark's to_json emits."""
    return json.dumps(
        rec, separators=(",", ":"), ensure_ascii=False
    ).encode("utf-8")


def _spark_wire(spark, recs, schema, key_col=None, keep_key=False):
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in schema.fields) for r in recs], schema
    )
    out = to_kafka_records(df, key_col=key_col, keep_key_in_value=keep_key)
    # the Kafka connector casts key/value to binary UTF-8 on send —
    # reproduce that cast so the assertion is about BYTES, not str
    rows = out.selectExpr(
        *(["CAST(key AS BINARY) AS key"] if key_col else []),
        "CAST(value AS BINARY) AS value",
    ).collect()
    return rows


def test_tracks_value_bytes_match_canonical_compact_json(spark):
    """Unkeyed tracks wire (OP-S5): value bytes are EXACTLY the compact
    UTF-8 encoding, field order = producer dict order
    (spotify_metadata_to_kafka.py:33-49 = TRACKS_WIRE_SCHEMA order)."""
    rows = _spark_wire(spark, TRACK_RECS, TRACKS_WIRE_SCHEMA)
    assert [bytes(r.value) for r in rows] == [
        _canonical(r) for r in TRACK_RECS
    ]


def test_tracks_value_parses_equal_to_reference_bytes(spark):
    """Interop: the reference's exact bytes (json.dumps defaults —
    ', '/': ' separators, ensure_ascii=True \\u-escapes) and ours parse
    to the SAME objects; the consumer (JSONEachRow) sees no
    difference."""
    rows = _spark_wire(spark, TRACK_RECS, TRACKS_WIRE_SCHEMA)
    ref_bytes = [json.dumps(r).encode("utf-8") for r in TRACK_RECS]
    for row, ref in zip(rows, ref_bytes):
        assert json.loads(bytes(row.value)) == json.loads(ref)


def test_artists_keyed_bytes_match_reference_layout(spark):
    """Keyed artists wire (OP-S6): key bytes = UTF-8 artist_id exactly
    as confluent-kafka encodes a str key; value KEEPS artist_id in the
    payload (the reference duplicates it, :126-127) and is
    byte-identical to the reference's ensure_ascii=False encoding
    modulo separator whitespace — asserted as byte equality against
    the canonical compact form plus parse equality against the
    reference's exact bytes."""
    rows = _spark_wire(
        spark, ARTIST_RECS, ARTISTS_WIRE_SCHEMA, key_col="artist_id", keep_key=True
    )
    for row, rec in zip(rows, ARTIST_RECS):
        assert bytes(row.key) == rec["artist_id"].encode("utf-8")
        assert bytes(row.value) == _canonical(rec)
        ref = json.dumps(rec, ensure_ascii=False).encode("utf-8")
        assert json.loads(bytes(row.value)) == json.loads(ref)
        # the reference layout differs ONLY in insignificant whitespace
        assert (
            bytes(row.value)
            == ref.replace(b", ", b",").replace(b": ", b":")
        )


def test_no_nulls_reach_the_wire_by_construction(spark):
    """Spark's to_json DROPS null fields while Python json.dumps writes
    explicit nulls — a real layout divergence IF nulls occurred. They
    cannot: both reference producers coalesce every field
    (spotify_metadata_to_kafka.py:33-49 `or ""` / `or 0`,
    spotify_artist_genres_to_kafka.py:101-108), and our cleanse layer
    does the same. Pin the divergence so it stays documented: a null
    field vanishes from our wire instead of serializing as null."""
    df = spark.createDataFrame(
        [("a1", None)], "artist_id string, artist_name string"
    )
    row = to_kafka_records(df, key_col="artist_id", keep_key_in_value=True).collect()[0]
    assert json.loads(row.value) == {"artist_id": "a1"}


def test_artists_keyed_bytes_default_drops_key_from_value(spark):
    """keep_key_in_value=False (our default, for consumers that read
    the key column): key bytes are still the UTF-8 artist_id, and the
    value is the compact encoding of the record WITHOUT artist_id,
    remaining fields in schema order. Pins the exact byte layout of
    the no-duplication wire so a field-order or separator change can't
    slip through."""
    rows = _spark_wire(
        spark, ARTIST_RECS, ARTISTS_WIRE_SCHEMA,
        key_col="artist_id", keep_key=False,
    )
    for row, rec in zip(rows, ARTIST_RECS):
        assert bytes(row.key) == rec["artist_id"].encode("utf-8")
        stripped = {k: v for k, v in rec.items() if k != "artist_id"}
        assert bytes(row.value) == _canonical(stripped)


# Multi-update stream for one artist: the compaction / latest-state
# case. Same artist_id, three ingest batches; genres and popularity
# evolve. Produce order == ingest_ts order (the reference DAG runs
# once per ingest_ts and produces sequentially).
ARTIST_UPDATES = [
    {
        "ingest_ts": "2025-07-28T09:00:00Z",
        "artist_id": "a1",
        "artist_name": "Björk",
        "genres": ["art pop"],
        "popularity": 70,
        "followers_total": 5864000,
    },
    {
        "ingest_ts": "2025-07-29T09:00:00Z",
        "artist_id": "a1",
        "artist_name": "Björk",
        "genres": ["art pop", "electronic"],
        "popularity": 74,
        "followers_total": 5864200,
    },
    {
        "ingest_ts": "2025-07-30T09:00:00Z",
        "artist_id": "a1",
        "artist_name": "Björk",
        "genres": ["art pop", "electronic", "experimental"],
        "popularity": 75,
        "followers_total": 5864310,
    },
    {
        "ingest_ts": "2025-07-30T09:00:00Z",
        "artist_id": "a2",
        "artist_name": "Мумий Тролль",
        "genres": ["russian rock"],
        "popularity": 55,
        "followers_total": 120000,
    },
]


def test_keyed_topic_compaction_keeps_reference_latest_state(spark):
    """The keyed-topic compaction contract (verdict r9 ask #7): a
    log-compacted artists topic retains, per key, the message with the
    HIGHEST OFFSET. Keying by artist_id puts all of one artist's
    updates in one partition, so offset order within the key == our
    produce order (the reference DAG produces sequentially per run,
    runs in ingest_ts order). Simulate the broker's compaction over
    the exact wire bytes — keep the last (key, value) per key — and
    assert the surviving values parse to the same latest state the
    reference's v_artist_latest view computes over the FULL history
    (002_views_techno.sql:9-15: argMax(..., ingest_ts) GROUP BY
    artist_id). If that equivalence broke — e.g. produce order stopped
    following ingest_ts — compaction would silently serve stale
    state."""
    rows = _spark_wire(
        spark, ARTIST_UPDATES, ARTISTS_WIRE_SCHEMA,
        key_col="artist_id", keep_key=True,
    )
    # broker-side log compaction: last offset per key survives
    compacted: dict[bytes, bytes] = {}
    for row in rows:  # collect() preserves the input (produce) order
        compacted[bytes(row.key)] = bytes(row.value)

    # reference consumer semantics: argMax by ingest_ts over history
    expected = {}
    for rec in ARTIST_UPDATES:
        cur = expected.get(rec["artist_id"])
        if cur is None or rec["ingest_ts"] >= cur["ingest_ts"]:
            expected[rec["artist_id"]] = rec

    assert {
        k.decode("utf-8"): json.loads(v) for k, v in compacted.items()
    } == expected
    # and each surviving value is still the exact canonical bytes
    for key, rec in expected.items():
        assert compacted[key.encode("utf-8")] == _canonical(rec)


def test_artists_wire_roundtrips_both_layouts(spark):
    """Consumer-side closure: to_kafka_records -> parse_artists_wire
    recovers the exact typed rows for BOTH layouts — artist_id from
    the duplicated value (the reference layout) and from the message
    key when keep_key_in_value=False."""
    from ravelytics_spark.sources.kafka import parse_artists_wire

    df = spark.createDataFrame(
        [tuple(r[f.name] for f in ARTISTS_WIRE_SCHEMA.fields) for r in ARTIST_RECS],
        ARTISTS_WIRE_SCHEMA,
    )
    for keep in (True, False):
        wire = to_kafka_records(df, key_col="artist_id", keep_key_in_value=keep)
        back = parse_artists_wire(wire, key_in_value=keep)
        got = sorted(
            (tuple(r) for r in back.collect()), key=lambda t: str(t)
        )
        exp = sorted(
            (
                tuple(
                    tuple(rec[f.name]) if isinstance(rec[f.name], list) else rec[f.name]
                    for f in ARTISTS_WIRE_SCHEMA.fields
                )
                for rec in ARTIST_RECS
            ),
            key=lambda t: str(t),
        )
        got = [
            tuple(tuple(v) if isinstance(v, list) else v for v in row)
            for row in got
        ]
        assert got == exp, (keep, got, exp)
