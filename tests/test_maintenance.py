"""Incremental latest-state refresh ≡ full recompute; compaction reduces
files and preserves data; audit flags localize defaulted records."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from ravelytics_spark.operators.latest_state import latest_state
from ravelytics_spark.operators.maintenance import (
    cleanse_tracks_with_audit,
    compact_partitions,
    merge_latest_state,
)


def _t(day):
    return datetime.datetime(2025, 7, day)


def test_incremental_merge_equals_full_recompute(spark):
    hist = spark.createDataFrame(
        [("a", _t(1), "A1"), ("a", _t(2), "A2"), ("b", _t(1), "B1")],
        ["k", "ts", "v"],
    )
    batch = spark.createDataFrame(
        [("a", _t(3), "A3"), ("c", _t(1), "C1")], ["k", "ts", "v"]
    )
    current = latest_state(hist, "k", "ts")

    # merge_latest_state drops ts from state? latest_state keeps value
    # cols only; add ts back as a tracked value for recursivity
    cur_with_ts = hist.groupBy("k").agg(
        F.max_by("v", "ts").alias("v"), F.max("ts").alias("ts")
    ).select("k", "ts", "v")
    merged = merge_latest_state(cur_with_ts, batch, key="k", ts="ts")
    full = hist.unionByName(batch).groupBy("k").agg(F.max_by("v", "ts").alias("v"))
    assert {(r.k, r.v) for r in merged.select("k", "v").collect()} == {
        (r.k, r.v) for r in full.collect()
    }


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"m{i % 2}") for i in range(1000)], ["x", "p"]
    )
    out = str(tmp_path / "wh")
    # write fragmented: many small files per partition
    df.repartition(20).write.partitionBy("p").parquet(out)
    n_before = len([f for f in os.listdir(f"{out}/p=m0") if f.endswith(".parquet")])
    assert n_before > 5

    compact_partitions(spark, out, "p", target_file_rows=10_000)
    n_after = len([f for f in os.listdir(f"{out}/p=m0") if f.endswith(".parquet")])
    assert n_after == 1
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.agg(F.sum("x")).collect()[0][0] == sum(range(1000))


def test_audit_flags_localize_bad_records(spark):
    from ravelytics_spark.schemas import TRACKS_WIRE_SCHEMA

    rows = [
        # clean record: no flags
        Row(ingest_ts="2025-07-30T06:00:00Z", track_id="ok", track_name="n",
            artists=["a"], artist_ids=["i"], album_id="", album_name="",
            release_date="2021-05-05", popularity=1,
            added_at="2025-07-30T06:00:00Z", external_url=""),
        # broken record: garbage everywhere
        Row(ingest_ts="not-a-ts", track_id="bad", track_name="n",
            artists=["a"], artist_ids=["i"], album_id="", album_name="",
            release_date="garbage", popularity=1, added_at="nope",
            external_url=""),
    ]
    wire = spark.createDataFrame(rows, TRACKS_WIRE_SCHEMA)
    audited = cleanse_tracks_with_audit(wire)
    got = {r.track_id: r for r in audited.collect()}
    ok, bad = got["ok"], got["bad"]
    assert not (ok.ingest_ts_defaulted or ok.release_date_defaulted or ok.added_at_defaulted)
    assert bad.ingest_ts_defaulted and bad.release_date_defaulted and bad.added_at_defaulted
    assert str(bad.release_date) == "1970-01-01"  # still cleansed downstream
    quarantine = audited.filter(
        F.col("ingest_ts_defaulted") | F.col("release_date_defaulted") | F.col("added_at_defaulted")
    )
    assert [r.track_id for r in quarantine.collect()] == ["bad"]


def test_compaction_refuses_streaming_sink_root(spark, tmp_path):
    """Rewriting part files under a _spark_metadata-managed root would
    invalidate the sink's transaction log — must refuse."""
    import pytest

    out = str(tmp_path / "sinkroot")
    spark.createDataFrame([(1, "m0")], ["x", "p"]).write.partitionBy("p").parquet(out)
    os.makedirs(os.path.join(out, "_spark_metadata"))
    with pytest.raises(ValueError, match="_spark_metadata"):
        compact_partitions(spark, out, "p")


def test_compaction_skips_partitions_inside_ingest_window(spark, tmp_path):
    """min_quiesce_s leaves recently-written partitions untouched (they
    may still be receiving appends)."""
    out = str(tmp_path / "wh2")
    df = spark.createDataFrame([(i, "m0") for i in range(100)], ["x", "p"])
    df.repartition(10).write.partitionBy("p").parquet(out)
    n_before = len([f for f in os.listdir(f"{out}/p=m0") if f.endswith(".parquet")])
    compact_partitions(spark, out, "p", min_quiesce_s=3600)
    n_after = len([f for f in os.listdir(f"{out}/p=m0") if f.endswith(".parquet")])
    assert n_after == n_before  # fresh partition skipped

    compact_partitions(spark, out, "p", min_quiesce_s=0)
    n_final = len([f for f in os.listdir(f"{out}/p=m0") if f.endswith(".parquet")])
    assert n_final == 1  # quiesced (cap lifted) → compacted


def _write_state_table(spark, path):
    rows = [
        Row(track_id="a", ingest_month="202501", popularity=10, ts=_t(1)),
        Row(track_id="b", ingest_month="202501", popularity=20, ts=_t(2)),
        Row(track_id="c", ingest_month="202502", popularity=30, ts=_t(3)),
    ]
    df = spark.createDataFrame(rows).select(
        "track_id", "popularity", "ts", "ingest_month"
    )
    df.write.partitionBy("ingest_month").mode("overwrite").parquet(path)


def test_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    from ravelytics_spark.operators.maintenance import upsert_partitioned

    path = str(tmp_path / "wh")
    _write_state_table(spark, path)
    untouched = os.path.join(path, "ingest_month=202502")
    before = {
        f: os.path.getmtime(os.path.join(untouched, f))
        for f in os.listdir(untouched)
    }

    delta = spark.createDataFrame(
        [
            # update existing key in 202501 (newer ts wins)
            Row(track_id="a", popularity=99, ts=_t(9), ingest_month="202501"),
            # stale update must LOSE to current state
            Row(track_id="b", popularity=0, ts=_t(1), ingest_month="202501"),
            # brand-new key in a brand-new partition
            Row(track_id="d", popularity=40, ts=_t(5), ingest_month="202503"),
        ]
    ).select("track_id", "popularity", "ts", "ingest_month")

    touched = upsert_partitioned(
        spark, path, delta, key="track_id", ts="ts",
        partition_col="ingest_month",
    )
    assert touched == ["202501", "202503"]

    after = {
        f: os.path.getmtime(os.path.join(untouched, f))
        for f in os.listdir(untouched)
    }
    assert before == after  # untouched partition bit-untouched

    got = {
        r["track_id"]: r["popularity"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {"a": 99, "b": 20, "c": 30, "d": 40}


def test_upsert_equals_full_recompute(spark, tmp_path):
    from ravelytics_spark.operators.maintenance import upsert_partitioned

    path = str(tmp_path / "wh2")
    _write_state_table(spark, path)
    original = spark.read.parquet(path).select(
        "track_id", "popularity", "ts", "ingest_month"
    )
    delta = spark.createDataFrame(
        [
            Row(track_id="a", popularity=77, ts=_t(8), ingest_month="202501"),
            Row(track_id="c", popularity=31, ts=_t(4), ingest_month="202502"),
        ]
    ).select("track_id", "popularity", "ts", "ingest_month")
    expected = {
        (r["track_id"], r["popularity"])
        for r in latest_state(
            original.unionByName(delta), key="track_id", ts="ts"
        ).collect()
    }
    upsert_partitioned(
        spark, path, delta, key="track_id", ts="ts",
        partition_col="ingest_month",
    )
    got = {
        (r["track_id"], r["popularity"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == expected
