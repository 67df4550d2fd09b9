"""Harness-only catalog entries for operators a batch SQL oracle cannot
check (SURVEY marks them `harness`): the streaming ingest cycle, the
multimodal binary pipeline, and the source readers. Each runs the real
operator end-to-end inside temp dirs and returns a deterministic
DataFrame for the driver's rows/schema check.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table

_WIRE_FIXTURE = [
    {
        "ingest_ts": "2025-07-30T06:00:00Z",
        "track_id": f"t{i}",
        "track_name": f"Track {i}",
        "artists": ["A", "B"],
        "artist_ids": ["a1", "b1"],
        "album_id": "al",
        "album_name": "Alb",
        "release_date": "2021" if i % 2 else "2022-03-04",
        "popularity": i,
        "added_at": "2025-07-18T09:27:45Z" if i % 3 else "",
        "external_url": "u",
    }
    for i in range(20)
]


@q(
    "s8_stream_ingest",
    "OP-S7/S8/T1/T2",
    "The full streaming ingest cycle: file-source wire stream → MV "
    "cleanse → partitioned parquet + checkpoint (Trigger.AvailableNow), "
    "read back from the warehouse. Deterministic fixture; rows/schema "
    "checked by the harness (Kafka swaps in via one reader call).",
    None,
)
def s8_stream_ingest(spark, sf_dir):
    from ravelytics_spark.streaming.pipeline import (
        read_tracks_stream_files,
        start_tracks_ingest,
    )

    base = tempfile.mkdtemp(prefix="rvl_stream_")
    src = os.path.join(base, "src")
    out = os.path.join(base, "warehouse")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    with open(os.path.join(src, "batch.json"), "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in _WIRE_FIXTURE))
    query = start_tracks_ingest(read_tracks_stream_files(spark, src), out, ckpt)
    query.awaitTermination(300)
    return (
        spark.read.parquet(out)
        .select("track_id", "release_date", "popularity", "ingest_month")
        .orderBy("track_id")
    )


@q(
    "x5_multimodal",
    "OP-X5/OP-S9",
    "Binary-column pipeline: binaryFile ingestion → Arrow mapInPandas "
    "image features + audio pointers (stub codecs, deterministic on "
    "content bytes). Rows/schema checked by the harness.",
    None,
)
def x5_multimodal(spark, sf_dir):
    from ravelytics_spark.operators.multimodal import image_features
    from ravelytics_spark.sources.binary import audio_pointer_records, read_binary_assets

    base = tempfile.mkdtemp(prefix="rvl_assets_")
    for i in range(8):
        with open(os.path.join(base, f"trk{i}.mp3"), "wb") as fh:
            fh.write(bytes([i]) * (512 + i))
    assets = read_binary_assets(spark, os.path.join(base, "*.mp3"))
    feats = image_features(assets)
    ptrs = audio_pointer_records(assets, "2025-07-30T00:00:00Z")
    return (
        feats.join(ptrs, feats.path == ptrs.audio_path)
        .select("track_id", "width", "height", "phash")
        .orderBy("track_id")
    )


@q(
    "s3_s4_json_sources",
    "OP-S3/S4",
    "JSON-array file reader + latest-file-by-mtime selection "
    "(distributed binaryFile listing form). Rows checked by harness.",
    None,
)
def s3_s4_json_sources(spark, sf_dir):
    from ravelytics_spark.sources.binary import latest_file_df, read_json_array

    base = tempfile.mkdtemp(prefix="rvl_json_")
    old = os.path.join(base, "playlist_old.json")
    new = os.path.join(base, "playlist_new.json")
    with open(old, "w") as fh:
        json.dump([{"k": i} for i in range(3)], fh)
    with open(new, "w") as fh:
        json.dump([{"k": i} for i in range(5)], fh)
    os.utime(old, (1_000_000_000, 1_000_000_000))
    newest = latest_file_df(spark, os.path.join(base, "*.json")).collect()[0].path
    return read_json_array(spark, newest).orderBy("k")


@q(
    "s5_kafka_wire",
    "OP-S5/S6/M1",
    "Kafka JSONEachRow wire serialization round-trip (keyed + unkeyed) "
    "over warehouse-derived records — the sink byte layout without a "
    "broker. Rows checked by harness.",
    None,
)
def s5_kafka_wire(spark, sf_dir):
    from ravelytics_spark.sources.kafka import to_kafka_records

    o = load_table(spark, sf_dir, "orders").limit(100)
    rec = o.select(
        F.col("o_orderkey").cast("string").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
    )
    keyed = to_kafka_records(rec, key_col="order_id")
    return keyed.select(
        "key", F.get_json_object("value", "$.status").alias("status")
    ).orderBy("key")


@q(
    "x59_dedup_ingest_stream",
    "OP-X2/T1-ext",
    "Continuous near-dup ingest end-to-end: two micro-batches through "
    "streaming/dedup_stream (MinHash signatures + banded LSH against "
    "the accumulated store, batch-ledger idempotence), second batch "
    "carrying an exact dup, an append-style near-dup, and fresh "
    "content. Returns the store's (doc_id, n_sig) rows — exactly the "
    "fresh survivors. Deterministic fixture; rows/schema checked by "
    "the harness.",
    None,
)
def x59_dedup_ingest_stream(spark, sf_dir):
    from ravelytics_spark.streaming.dedup_stream import start_dedup_ingest

    base = tempfile.mkdtemp(prefix="rvl_dedup_stream_")
    src = os.path.join(base, "src")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    ledger = os.path.join(base, "ledger.jsonl")
    os.makedirs(src)
    lorem = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays detroit techno records all night long in a warehouse"
    )
    other = (
        "completely different content about orbital mechanics and the "
        "restricted three body problem with lagrange points"
    )
    with open(os.path.join(src, "b1.json"), "w") as fh:
        fh.write(
            "\n".join(
                json.dumps({"doc_id": i, "text": t})
                for i, t in [(1, lorem), (2, other)]
            )
        )
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    start_dedup_ingest(stream, store, ckpt, ledger).awaitTermination(300)
    with open(os.path.join(src, "b2.json"), "w") as fh:
        fh.write(
            "\n".join(
                json.dumps({"doc_id": i, "text": t})
                for i, t in [
                    (10, lorem),                      # exact dup → dropped
                    (11, lorem + " tonight again"),   # near dup → dropped
                    (12, "fresh standalone content with many unusual "
                         "words that matches nothing stored so far"),
                ]
            )
        )
    stream2 = spark.readStream.schema("doc_id long, text string").json(src)
    start_dedup_ingest(stream2, store, ckpt, ledger).awaitTermination(300)
    return (
        spark.read.parquet(store)
        .select("doc_id", F.size("sig").cast("long").alias("n_sig"))
        .orderBy("doc_id")
    )


@q(
    "x63_hll_rollup",
    "OP-G5-ext",
    "Mergeable HLL sketches, the ClickHouse uniqState/uniqMerge "
    "pattern: day-level (month, day) sketches over orders.o_custkey "
    "merged to month level WITHOUT rescanning raw data, estimate "
    "beside the exact distinct. Sketches are rows (register, max_rho) "
    "built from seeded xxhash64 + integer bit math — deterministic "
    "under any partitioning (merge associativity is register-exact, "
    "tests/test_sketches.py), but DuckDB cannot replicate xxhash64 → "
    "harness rows-check.",
    None,
)
def x63_hll_rollup(spark, sf_dir):
    from ravelytics_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyyMM").alias("month"),
        F.to_date("o_orderdate").alias("day"),
        "o_custkey",
    )
    daily = hll_sketch(o, "o_custkey", ["month", "day"])
    est = hll_estimate(hll_merge(daily, ["month"]), ["month"])
    exact = o.groupBy("month").agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "month").orderBy("month")


@q(
    "x64_kmv_rollup",
    "OP-G5/X8-ext",
    "KMV bottom-k sketches (quantileState/quantileMerge analog): "
    "month-level sketches of orders.o_totalprice values merged to a "
    "global sketch, distinct estimate + median estimate beside the "
    "exact figures. Deterministic (seeded xxhash64, set-exact merge) "
    "but DuckDB lacks the hash → harness rows-check; estimator "
    "accuracy is property-tested in tests/test_sketches.py.",
    None,
)
def x64_kmv_rollup(spark, sf_dir):
    from ravelytics_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_merge,
        kmv_quantile_estimate,
        kmv_sketch,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyyMM").alias("month"), "o_custkey"
    )
    monthly = kmv_sketch(o, "o_custkey", ["month"], k=64)
    merged = kmv_merge(monthly, [], k=64)
    est = kmv_distinct_estimate(merged, [], k=64).select(
        F.lit("all").alias("scope"), "approx_distinct"
    )
    med = kmv_quantile_estimate(merged, [0.5], []).select(
        F.round("quantile", 1).alias("approx_median_custkey")
    )
    exact = o.agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct"),
        F.expr("percentile(o_custkey, 0.5)").alias("exact_median"),
    )
    return est.join(med).join(exact)
