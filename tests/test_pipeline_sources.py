"""Tests for orchestration (skip semantics), REST acquisition, Kafka
wire format, and the golden normalize test on the reference's real
sample playlist (SURVEY §5.2)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ravelytics_spark.pipeline import Pipeline, SkipStep, Status
from ravelytics_spark.sources import rest
from ravelytics_spark.sources.kafka import parse_tracks_wire, to_kafka_records

# --- runner -----------------------------------------------------------------


def test_pipeline_success_and_context_passing():
    pipe = Pipeline()

    @pipe.step("preflight")
    def preflight(ctx):
        return "token"

    @pipe.step("fetch", depends_on=["preflight"])
    def fetch(ctx):
        return ctx["preflight"] + ":data"

    results = pipe.run()
    assert results["fetch"].status is Status.SUCCESS
    assert results["fetch"].value == "token:data"


def test_pipeline_skip_propagates_not_fails():
    pipe = Pipeline()
    pipe.add_calls = 0

    @pipe.step("preflight")
    def preflight(ctx):
        raise SkipStep("no creds")

    @pipe.step("fetch", depends_on=["preflight"])
    def fetch(ctx):
        raise AssertionError("must not run")

    results = pipe.run()
    assert results["preflight"].status is Status.SKIPPED
    assert results["fetch"].status is Status.UPSTREAM_SKIPPED


def test_pipeline_failure_propagates_and_retries():
    pipe = Pipeline()
    attempts = []

    @pipe.step("flaky", retries=2)
    def flaky(ctx):
        attempts.append(1)
        raise RuntimeError("boom")

    @pipe.step("downstream", depends_on=["flaky"])
    def downstream(ctx):
        return 1

    results = pipe.run()
    assert len(attempts) == 3  # 1 + 2 retries
    assert results["flaky"].status is Status.FAILED
    assert results["downstream"].status is Status.UPSTREAM_FAILED


# --- REST acquisition -------------------------------------------------------


def test_fetch_paginated_follows_cursor():
    pages = {
        "u0": {"items": [{"i": 0}, {"i": 1}], "next": "u1"},
        "u1": {"items": [{"i": 2}], "next": None},
    }
    got = rest.fetch_paginated(lambda url, p: pages[url], "u0")
    assert [x["i"] for x in got] == [0, 1, 2]


def test_fetch_paginated_empty_skips():
    with pytest.raises(SkipStep):
        rest.fetch_paginated(lambda url, p: {"items": [], "next": None}, "u0")


def test_preflight_skips_on_probe_failure():
    with pytest.raises(SkipStep):
        rest.preflight(lambda u, p: (_ for _ in ()).throw(IOError("403")), "u")
    with pytest.raises(SkipStep):
        rest.preflight(lambda u, p: {}, "u", required=[""])
    rest.preflight(lambda u, p: {}, "u", required=["tok"])  # no raise


def test_enrich_batched_distributed(spark):
    ids = spark.createDataFrame([(f"a{i:03d}",) for i in range(120)], ["id"])

    def transport(url, params):
        # runs on executors: report the observed call-batch size in-band
        batch = params["ids"].split(",")
        return {
            "records": [{"artist_id": b, "call_batch": len(batch)} for b in batch]
        }

    schema = T.StructType(
        [T.StructField("artist_id", T.StringType()), T.StructField("call_batch", T.LongType())]
    )
    out = rest.enrich_batched(ids, transport, "u", schema, batch_size=50)
    rows = out.collect()
    assert len(rows) == 120
    assert {r.artist_id for r in rows} == {f"a{i:03d}" for i in range(120)}
    # ≤50 ids per call (the reference's API contract)
    assert max(r.call_batch for r in rows) <= 50


def test_unique_ids_from_arrays(spark):
    df = spark.createDataFrame(
        [(["a", "b"],), (["b", ""],), (["c"],)], ["artist_ids"]
    )
    got = [r.id for r in rest.unique_ids_from_arrays(df, "artist_ids").collect()]
    assert got == ["a", "b", "c"]


# --- Kafka wire format ------------------------------------------------------


def test_kafka_wire_roundtrip(spark):
    from ravelytics_spark.schemas import TRACKS_WIRE_SCHEMA

    rows = [
        {
            "ingest_ts": "2025-07-30T06:00:00Z",
            "track_id": "t1",
            "track_name": "One",
            "artists": ["A"],
            "artist_ids": ["a1"],
            "album_id": "al",
            "album_name": "Alb",
            "release_date": "2021",
            "popularity": 5,
            "added_at": "2025-07-18T09:27:45Z",
            "external_url": "u",
        }
    ]
    df = spark.createDataFrame(rows, TRACKS_WIRE_SCHEMA)
    wire = to_kafka_records(df)
    assert wire.columns == ["value"]
    parsed = parse_tracks_wire(wire)
    assert parsed.collect() == df.collect()


def test_kafka_keyed_records(spark):
    df = spark.createDataFrame([("a1", "X", 5)], ["artist_id", "name", "pop"])
    wire = to_kafka_records(df, key_col="artist_id")
    row = wire.collect()[0]
    assert row.key == "a1"
    assert json.loads(row.value) == {"name": "X", "pop": 5}  # key not duplicated in value


# --- golden test: the real reference sample through normalize ---------------

SAMPLE = "/root/reference/data/raw/spotify/playlist_18vUeZ9BdtMRNV6gI8RnR6_2025-07-30.json"


@pytest.mark.skipif(not os.path.exists(SAMPLE), reason="reference sample not present")
def test_golden_normalize_reference_sample(spark):
    """The 150-item sample playlist through OP-P1/P2/P3 normalization:
    the known facts from FIXTURES.md must hold (150 tracks, 166 unique
    artists, popularity 0-85, release years plausible)."""
    from ravelytics_spark.plans.tracks_pipeline import cleanse_tracks, normalize_playlist_items
    from ravelytics_spark.sources.binary import read_json_array

    items = read_json_array(spark, SAMPLE)
    wire = normalize_playlist_items(items, ingest_ts=F.lit("2025-07-30T00:00:00Z"))
    recs = wire.collect()
    assert len(recs) == 150
    assert all(r.track_id for r in recs)

    uniq_artists = (
        wire.select(F.explode("artist_ids").alias("a")).distinct().count()
    )
    assert uniq_artists == 166

    pop = wire.agg(F.min("popularity"), F.max("popularity")).collect()[0]
    assert pop[0] >= 0 and pop[1] <= 85

    cleaned = cleanse_tracks(wire)
    dates = cleaned.select("release_date").collect()
    assert all(1900 <= r.release_date.year <= 2026 for r in dates)
    # mixed precision handled: no 1970 fallbacks in this sample (all
    # release dates are valid YYYY or YYYY-MM-DD)
    assert cleaned.filter(F.col("release_date") == "1970-01-01").count() == 0


# --- Topic admin (OP-S10) ---------------------------------------------------


class _FakeAdmin:
    def __init__(self, existing):
        self.topics = list(existing)
        self.created = []

    def list_topics(self):
        return self.topics

    def create_topic(self, name, num_partitions, replication_factor):
        self.created.append((name, num_partitions, replication_factor))
        self.topics.append(name)


def test_ensure_topic_creates_when_missing():
    from ravelytics_spark.sources.kafka import ensure_topic

    admin = _FakeAdmin(["other"])
    assert ensure_topic(admin, "tracks", num_partitions=3, replication_factor=2) is True
    assert admin.created == [("tracks", 3, 2)]
    # second call: exists → no-op (the reference's create-if-missing)
    assert ensure_topic(admin, "tracks") is False
    assert admin.created == [("tracks", 3, 2)]


def test_ensure_topic_leaves_existing_untouched():
    from ravelytics_spark.sources.kafka import ensure_topic

    admin = _FakeAdmin(["tracks"])
    assert ensure_topic(admin, "tracks", num_partitions=8) is False
    assert admin.created == []
