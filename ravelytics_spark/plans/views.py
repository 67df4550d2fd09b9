"""The techno view stack — the reference's signature analytics output.

Rebuilds the 4-deep ClickHouse view chain (002_views_techno.sql:9-58)
as DataFrame plan builders AND registered Spark SQL temp views, so both
``v_track_is_techno(tracks, artists)`` and
``spark.sql("SELECT ... FROM v_track_is_techno")`` work.

Scale notes (100 TB): the only shuffle-bearing ops are the OP-G1
latest-state agg (one shuffle on artist_id), the OP-J1 join (the artist
dim after latest-state is small — Spark auto-broadcasts under the 10 MB
threshold, and we hint it), and the OP-G3 per-track group. The explode
(OP-A1) multiplies rows ~2-3× but stays pipelined — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ravelytics_spark.operators.latest_state import latest_state


def v_artist_latest(artists: DataFrame) -> DataFrame:
    """Latest artist state via argMax (ref 002:9-15)."""
    return latest_state(
        artists, key="artist_id", ts="ingest_ts", value_cols=["artist_name", "genres"]
    )


def v_track_artists(tracks: DataFrame) -> DataFrame:
    """One row per (track, artist): arrayJoin → explode (ref 002:18-24)."""
    return tracks.select(
        "ingest_ts",
        "track_id",
        "track_name",
        F.explode("artist_ids").alias("artist_id"),
    )


def v_track_genres(tracks: DataFrame, artists: DataFrame) -> DataFrame:
    """Per-track genre union across its artists (ref 002:27-44).

    groupArray(if(isNull(al.artist_id), emptyArrayString(), al.genres))
    → collect_list over a coalesce; then flatten → lower → distinct.
    The left join keeps tracks whose artists are unknown (ref 002:41-43);
    the artist-latest side is broadcast — after OP-G1 it is one row per
    artist, the classic small dim.
    """
    ta = v_track_artists(tracks)
    al = v_artist_latest(artists)
    joined = ta.join(F.broadcast(al), "artist_id", "left")
    genres_or_empty = F.coalesce(F.col("genres"), F.array().cast("array<string>"))
    return (
        joined.groupBy("ingest_ts", "track_id", "track_name")
        .agg(F.collect_list(genres_or_empty).alias("__genre_arrays"))
        .select(
            "ingest_ts",
            "track_id",
            "track_name",
            F.array_distinct(
                F.transform(F.flatten("__genre_arrays"), lambda g: F.lower(g))
            ).alias("all_genres"),
        )
    )


def v_track_is_techno(
    tracks: DataFrame, artists: DataFrame, needle: str = "techno"
) -> DataFrame:
    """Techno flag (ref 002:47-58): case-insensitive substring 'techno'
    anywhere in any genre. 'melodic techno' matches; 'tech house' must not.
    ``needle`` is parameterized for reuse; the reference hardcodes 'techno'.
    """
    tg = v_track_genres(tracks, artists)
    matched = F.filter(
        F.transform(F.col("all_genres"), lambda g: F.lower(g)),
        lambda g: F.instr(g, needle) > 0,
    )
    return tg.select(
        "ingest_ts",
        "track_id",
        "track_name",
        "all_genres",
        matched.alias("matched"),
    ).withColumn("is_techno", F.size("matched") > 0)


def register_views(spark: SparkSession, tracks: DataFrame, artists: DataFrame) -> None:
    """Register the full stack as temp views for the SQL entry point.

    Spark SQL views are logical-plan substitution (like ClickHouse view
    inlining), so predicate pushdown and column pruning flow through the
    whole stack to the base scans.
    """
    tracks.createOrReplaceTempView("spotify_tracks")
    artists.createOrReplaceTempView("spotify_artists")
    v_artist_latest(artists).createOrReplaceTempView("v_artist_latest")
    v_track_artists(tracks).createOrReplaceTempView("v_track_artists")
    v_track_genres(tracks, artists).createOrReplaceTempView("v_track_genres")
    v_track_is_techno(tracks, artists).createOrReplaceTempView("v_track_is_techno")


def register_sql_views(spark: SparkSession) -> None:
    """Pure-SQL registration of the same stack (expects spotify_tracks /
    spotify_artists temp views to exist) — demonstrates the ClickHouse SQL
    surface ports 1:1 to Spark SQL (ref 002_views_techno.sql:9-58)."""
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW v_artist_latest AS
        SELECT artist_id,
               max_by(artist_name, ingest_ts) AS artist_name,
               max_by(genres, ingest_ts) AS genres
        FROM spotify_artists GROUP BY artist_id
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW v_track_artists AS
        SELECT ingest_ts, track_id, track_name,
               explode(artist_ids) AS artist_id
        FROM spotify_tracks
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW v_track_genres AS
        SELECT ta.ingest_ts, ta.track_id, ta.track_name,
               array_distinct(transform(flatten(collect_list(
                   coalesce(al.genres, array()))), g -> lower(g))) AS all_genres
        FROM v_track_artists ta
        LEFT JOIN v_artist_latest al ON ta.artist_id = al.artist_id
        GROUP BY ta.ingest_ts, ta.track_id, ta.track_name
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW v_track_is_techno AS
        SELECT ingest_ts, track_id, track_name, all_genres,
               filter(all_genres, g -> instr(lower(g), 'techno') > 0) AS matched,
               size(filter(all_genres, g -> instr(lower(g), 'techno') > 0)) > 0
                   AS is_techno
        FROM v_track_genres
        """
    )
