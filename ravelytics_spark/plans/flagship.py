"""Flagship query: the techno view stack end-to-end over synthetic tables.

The reference's signature output is ``v_track_is_techno``
(002_views_techno.sql:47-58). To make it oracle-checkable on the driver's
TPC-H-ish testdata, we derive a deterministic tracks/artists shape from
``orders`` (tracks: one per order, two "artists" per track) and ``events``
(artist state stream: user_id → artist, multiple ingest_ts snapshots,
genres from event_type), then run the REAL view stack
(``ravelytics_spark.plans.views``) unchanged — exercising OP-G1 argMax,
OP-A1 explode, OP-J1 left join, OP-G2/G3 collect+group, OP-A2-A5 HOFs and
the OP-A3/F2 substring flag in one plan.

The needle is 'c' (genres are event types: 'click'/'purchase' match,
'view'/'error'/'signup' partially) so the flag exercises both branches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ravelytics_spark.operators.skew import fan_out_scan
from ravelytics_spark.plans import views
from ravelytics_spark.sources.tables import load_table


def synth_tracks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tracks derived from orders: artist_ids = [custkey, custkey%97]."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderdate").alias("ingest_ts"),
        F.col("o_orderkey").cast("string").alias("track_id"),
        F.col("o_orderpriority").alias("track_name"),
        F.array(
            F.col("o_custkey").cast("string"),
            (F.col("o_custkey") % 97).cast("string"),
        ).alias("artist_ids"),
    )


def synth_artists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Artist state stream derived from events: per (user_id, ts) snapshot
    with genres [event_type, 'g<user_id % 7>']."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("ts").alias("ingest_ts"),
        F.col("user_id").cast("string").alias("artist_id"),
        F.concat(F.lit("artist_"), F.col("user_id")).alias("artist_name"),
        F.array(F.col("event_type"), F.concat(F.lit("g"), F.col("user_id") % 7)).alias(
            "genres"
        ),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v_track_is_techno over the synthetic domain, output serialized for
    hash-stable comparison (arrays sorted + joined)."""
    tracks = synth_tracks(spark, sf_dir)
    # r13: the tracks side runs explode -> broadcast-probe ->
    # partial collect_list entirely inside the scan's task layout, and a
    # single-file orders scan serialized all of it onto ONE task (stage
    # trace: 1 task, 603 ms, writing the 5 MB pre-agg exchange while 31
    # cores idled). Round-robin fan-out of the projected 4-column frame
    # restores parallelism; self-gating no-op when the scan already has
    # enough partitions (any well-laid-out input at scale). Interleaved
    # A/B x7: med 1.73 s -> 1.50 s, byte-identical. (A pre-sort hash
    # barrier for the range-sampling double-read was also measured:
    # neutral alone, within noise on top of the fan-out — not taken, it
    # adds a result-sized exchange at scale.)
    tracks = fan_out_scan(tracks)
    artists = synth_artists(spark, sf_dir)
    out = views.v_track_is_techno(tracks, artists, needle="c")
    return out.select(
        F.col("track_id"),
        F.col("track_name"),
        F.array_join(F.array_sort("all_genres"), ",").alias("all_genres"),
        F.array_join(F.array_sort("matched"), ",").alias("matched"),
        F.col("is_techno"),
    ).orderBy("track_id")


# DuckDB oracle: the same semantics spelled in ANSI SQL. unnest ≡ explode,
# arg_max ≡ max_by, list() ≡ collect_list, flatten/list_distinct/
# list_filter ≡ the Spark HOFs.
FLAGSHIP_ORACLE = """
WITH tracks AS (
    SELECT
        o_orderdate AS ingest_ts,
        CAST(o_orderkey AS VARCHAR) AS track_id,
        o_orderpriority AS track_name,
        [CAST(o_custkey AS VARCHAR), CAST(o_custkey % 97 AS VARCHAR)] AS artist_ids
    FROM orders
),
artists AS (
    SELECT
        ts AS ingest_ts,
        CAST(user_id AS VARCHAR) AS artist_id,
        'artist_' || CAST(user_id AS VARCHAR) AS artist_name,
        [event_type, 'g' || CAST(user_id % 7 AS VARCHAR)] AS genres
    FROM events
),
artist_latest AS (
    SELECT artist_id, arg_max(genres, ingest_ts) AS genres
    FROM artists GROUP BY artist_id
),
track_artists AS (
    SELECT ingest_ts, track_id, track_name, unnest(artist_ids) AS artist_id
    FROM tracks
),
track_genres AS (
    SELECT
        ta.ingest_ts, ta.track_id, ta.track_name,
        list_distinct(list_transform(flatten(list(
            CASE WHEN al.artist_id IS NULL THEN [] ELSE al.genres END
        )), g -> lower(g))) AS all_genres
    FROM track_artists ta
    LEFT JOIN artist_latest al ON ta.artist_id = al.artist_id
    GROUP BY ta.ingest_ts, ta.track_id, ta.track_name
),
flagged AS (
    SELECT
        track_id, track_name, all_genres,
        list_filter(all_genres, g -> instr(g, 'c') > 0) AS matched
    FROM track_genres
)
SELECT
    track_id,
    track_name,
    coalesce(array_to_string(list_sort(all_genres), ','), '') AS all_genres,
    coalesce(array_to_string(list_sort(matched), ','), '') AS matched,
    len(matched) > 0 AS is_techno
FROM flagged
ORDER BY track_id
"""
