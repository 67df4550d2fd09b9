"""Declared schemas for the domain pipeline (FIXTURES.md §1-5).

The warehouse schema is fixed DDL in the reference
(001_init_spotify_tracks.sql:6-22); the wire schema is stringly-typed
(001:25-47) with coercion in the MV. The artists DDL is absent from the
reference repo — implied by the producer record
(spotify_artist_genres_to_kafka.py:101-108).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Wire record for tracks (JSONEachRow on Kafka) — all temporal fields are
# strings on the wire; the MV coerces (ref 001:25-47).
TRACKS_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("ingest_ts", T.StringType()),
        T.StructField("track_id", T.StringType()),
        T.StructField("track_name", T.StringType()),
        T.StructField("artists", T.ArrayType(T.StringType())),
        T.StructField("artist_ids", T.ArrayType(T.StringType())),
        T.StructField("album_id", T.StringType()),
        T.StructField("album_name", T.StringType()),
        T.StructField("release_date", T.StringType()),
        T.StructField("popularity", T.IntegerType()),
        T.StructField("added_at", T.StringType()),
        T.StructField("external_url", T.StringType()),
    ]
)

# Cleaned warehouse table (ref 001:6-22); partition column ingest_month
# derived from ingest_ts (001:21).
TRACKS_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("ingest_ts", T.TimestampType()),
        T.StructField("track_id", T.StringType()),
        T.StructField("track_name", T.StringType()),
        T.StructField("artists", T.ArrayType(T.StringType())),
        T.StructField("artist_ids", T.ArrayType(T.StringType())),
        T.StructField("album_id", T.StringType()),
        T.StructField("album_name", T.StringType()),
        T.StructField("release_date", T.DateType()),
        T.StructField("popularity", T.IntegerType()),
        T.StructField("added_at", T.TimestampType()),
        T.StructField("external_url", T.StringType()),
    ]
)

# Artists record (producer shape spotify_artist_genres_to_kafka.py:101-108,
# consumed by 002_views_techno.sql:9-15).
ARTISTS_SCHEMA = T.StructType(
    [
        T.StructField("ingest_ts", T.TimestampType()),
        T.StructField("artist_id", T.StringType()),
        T.StructField("artist_name", T.StringType()),
        T.StructField("genres", T.ArrayType(T.StringType())),
        T.StructField("popularity", T.IntegerType()),
        T.StructField("followers_total", T.LongType()),
    ]
)

# Artists wire record (stringly ingest_ts, like the tracks wire format).
ARTISTS_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("ingest_ts", T.StringType()),
        T.StructField("artist_id", T.StringType()),
        T.StructField("artist_name", T.StringType()),
        T.StructField("genres", T.ArrayType(T.StringType())),
        T.StructField("popularity", T.IntegerType()),
        T.StructField("followers_total", T.LongType()),
    ]
)

# Audio pointer message (ref spotify_audio_ingest.py:70-74).
AUDIO_POINTER_SCHEMA = T.StructType(
    [
        T.StructField("track_id", T.StringType()),
        T.StructField("audio_path", T.StringType()),
        T.StructField("fetched_at", T.StringType()),
    ]
)
