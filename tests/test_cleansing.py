"""Unit tests for the cleansing expression library on edge-case fixtures
(SURVEY §5.1): YYYY-only dates, garbage, nulls, empty arrays, unicode."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from ravelytics_spark.functions.cleansing import (
    best_effort_timestamp,
    ingest_month,
    normalize_release_date,
    null_default,
)


def test_release_date_rule(spark):
    # Ref 001_init_spotify_tracks.sql:61-70: YYYY → YYYY-01-01; longer →
    # left 10; garbage/null/empty → 1970-01-01.
    rows = [
        ("2021", datetime.date(2021, 1, 1)),
        ("2021-07-30", datetime.date(2021, 7, 30)),
        ("2021-07-30T12:00:00Z", datetime.date(2021, 7, 30)),
        ("garbage", datetime.date(1970, 1, 1)),
        ("", datetime.date(1970, 1, 1)),
        (None, datetime.date(1970, 1, 1)),
        ("123", datetime.date(1970, 1, 1)),  # not a YYYY, not a date
        ("12345", datetime.date(1970, 1, 1)),  # 5 digits → left(10) fails
    ]
    df = spark.createDataFrame([Row(s=s) for s, _ in rows])
    got = df.select(normalize_release_date("s").alias("d")).collect()
    assert [r.d for r in got] == [want for _, want in rows]


def test_best_effort_timestamp(spark):
    df = spark.createDataFrame(
        [
            Row(s="2025-07-18T09:27:45Z"),
            Row(s="2025-07-18T09:27:45+00:00"),
            Row(s="2025-07-18 09:27:45"),
            Row(s="not-a-ts"),
            Row(s=None),
        ]
    )
    fallback = F.lit("1999-01-01").cast("timestamp")
    got = df.select(best_effort_timestamp("s", fallback=fallback).alias("t")).collect()
    want_ok = datetime.datetime(2025, 7, 18, 9, 27, 45)
    want_fb = datetime.datetime(1999, 1, 1)
    assert [r.t for r in got] == [want_ok, want_ok, want_ok, want_fb, want_fb]


def test_null_default_and_month(spark):
    df = spark.createDataFrame([Row(x=None, ts="2025-07-18T09:27:45Z"), Row(x=5, ts=None)])
    got = df.select(
        null_default("x", 0).alias("x"),
        ingest_month(F.col("ts").cast("timestamp")).alias("m"),
    ).collect()
    assert [(r.x, r.m) for r in got] == [(0, "202507"), (5, None)]
