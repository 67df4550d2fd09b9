"""Golden tests for the techno view stack on domain fixtures (SURVEY
§5.2): mixed-case genres, unknown artists (left-join nulls → empty
arrays), argMax latest-state across snapshots, 'tech house' must NOT
match / 'melodic TECHNO' must."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from ravelytics_spark.plans import views
from ravelytics_spark.schemas import ARTISTS_SCHEMA, TRACKS_TABLE_SCHEMA

T0 = datetime.datetime(2025, 7, 1, 0, 0, 0)
T1 = datetime.datetime(2025, 7, 2, 0, 0, 0)


def _tracks(spark):
    rows = [
        # track with two artists, one unknown to the artists table
        Row(
            ingest_ts=T1, track_id="t1", track_name="Track One",
            artists=["A", "Zed"], artist_ids=["a1", "zz"],
            album_id="al1", album_name="Album", release_date=datetime.date(2021, 1, 1),
            popularity=50, added_at=T0, external_url="u1",
        ),
        # track whose artist's genres changed between snapshots
        Row(
            ingest_ts=T1, track_id="t2", track_name="Track Two",
            artists=["B"], artist_ids=["b1"],
            album_id="al2", album_name="Album", release_date=datetime.date(2022, 1, 1),
            popularity=60, added_at=T0, external_url="u2",
        ),
        # track with zero known artists → empty genre set, not dropped
        Row(
            ingest_ts=T1, track_id="t3", track_name="Track Three",
            artists=["Ghost"], artist_ids=["nope"],
            album_id="al3", album_name="Album", release_date=datetime.date(2023, 1, 1),
            popularity=0, added_at=T0, external_url="u3",
        ),
    ]
    return spark.createDataFrame(rows, TRACKS_TABLE_SCHEMA)


def _artists(spark):
    rows = [
        # a1: stable, mixed-case genre that MUST match
        Row(ingest_ts=T0, artist_id="a1", artist_name="A",
            genres=["melodic TECHNO", "Trance"], popularity=70, followers_total=10),
        # b1 snapshot 1: genre that must NOT match ('tech house')
        Row(ingest_ts=T0, artist_id="b1", artist_name="B",
            genres=["tech house"], popularity=10, followers_total=5),
        # b1 snapshot 2 (latest): becomes techno — argMax must pick this
        Row(ingest_ts=T1, artist_id="b1", artist_name="B",
            genres=["Hard-Techno", "tech house"], popularity=20, followers_total=9),
    ]
    return spark.createDataFrame(rows, ARTISTS_SCHEMA)


def test_artist_latest_argmax(spark):
    got = {r.artist_id: r.genres for r in views.v_artist_latest(_artists(spark)).collect()}
    assert got["b1"] == ["Hard-Techno", "tech house"]  # latest snapshot wins
    assert got["a1"] == ["melodic TECHNO", "Trance"]


def test_track_genres_lower_distinct_and_unknown_artist(spark):
    got = {
        r.track_id: sorted(r.all_genres)
        for r in views.v_track_genres(_tracks(spark), _artists(spark)).collect()
    }
    assert got["t1"] == ["melodic techno", "trance"]  # unknown 'zz' adds nothing
    assert got["t2"] == ["hard-techno", "tech house"]  # latest snapshot's set
    assert got["t3"] == []  # no known artists → empty, row retained


def test_is_techno_flag(spark):
    got = {
        r.track_id: (sorted(r.matched), r.is_techno)
        for r in views.v_track_is_techno(_tracks(spark), _artists(spark)).collect()
    }
    assert got["t1"] == (["melodic techno"], True)  # substring match
    assert got["t2"] == (["hard-techno"], True)  # 'tech house' NOT matched
    assert got["t3"] == ([], False)


def test_unicode_genres(spark):
    """FIXTURES.md §4: unicode genre strings — lowerUTF8 parity and
    substring matching must be unicode-aware (ClickHouse lowerUTF8 ≡
    Spark lower on full Unicode)."""
    tracks = spark.createDataFrame(
        [Row(ingest_ts=T1, track_id="t9", track_name="Трек", artists=["Б"],
             artist_ids=["u1"], album_id="a", album_name="Ä", release_date=datetime.date(2021, 1, 1),
             popularity=1, added_at=T0, external_url="")],
        TRACKS_TABLE_SCHEMA,
    )
    artists = spark.createDataFrame(
        [Row(ingest_ts=T0, artist_id="u1", artist_name="Берлин",
             genres=["БЕРЛИН-TECHNO", "München House", "TECHNO™"], popularity=9,
             followers_total=1)],
        ARTISTS_SCHEMA,
    )
    got = views.v_track_is_techno(tracks, artists).collect()[0]
    assert sorted(got.all_genres) == ["münchen house", "techno™", "берлин-techno"]
    assert sorted(got.matched) == ["techno™", "берлин-techno"]
    assert got.is_techno is True


def test_sql_view_stack_matches_dataframe_stack(spark):
    tracks, artists = _tracks(spark), _artists(spark)
    tracks.createOrReplaceTempView("spotify_tracks")
    artists.createOrReplaceTempView("spotify_artists")
    views.register_sql_views(spark)
    sql_rows = {
        (r.track_id, tuple(sorted(r.all_genres)), r.is_techno)
        for r in spark.sql(
            "SELECT track_id, all_genres, is_techno FROM v_track_is_techno"
        ).collect()
    }
    df_rows = {
        (r.track_id, tuple(sorted(r.all_genres)), r.is_techno)
        for r in views.v_track_is_techno(tracks, artists)
        .select("track_id", "all_genres", "is_techno")
        .collect()
    }
    assert sql_rows == df_rows
