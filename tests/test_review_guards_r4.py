"""Regression pins for the round-4 self-review findings: empty-input
behavior and fixed-point range guard of the x22/x30 map-only rewrites,
hot-bucket handling of the streamed fuzzy pair expansion, and the
dedup-stream store-absent classifier's legacy-message fallback."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ravelytics_spark.plans.queries import REGISTRY


@pytest.fixture()
def empty_embeddings_dir(spark, tmp_path):
    spark.createDataFrame(
        [], "vec_id long, label string, embedding array<float>"
    ).write.parquet(os.path.join(str(tmp_path), "embeddings.parquet"))
    return str(tmp_path)


def test_x30_empty_table_returns_empty_not_raise(spark, empty_embeddings_dir):
    df = REGISTRY["x30_rp_projection"].spark(spark, empty_embeddings_dir)
    assert df.count() == 0
    assert df.columns == ["vec_id", "j", "proj"]


def test_x22_empty_table_returns_empty_not_raise(spark, empty_embeddings_dir):
    df = REGISTRY["x22_centroid_assign"].spark(spark, empty_embeddings_dir)
    assert df.count() == 0
    assert df.columns == ["label", "assigned", "n"]


def test_x30_out_of_range_elements_raise_loudly(spark, tmp_path):
    """decimal(18,12) / scaled-long fixed point covers |x| < 1e6 (and
    tighter for wide vectors); out-of-domain inputs must raise at plan
    build, never wrap or throw mid-job."""
    spark.createDataFrame(
        [(1, "a", [2.0e6] * 4)],
        "vec_id long, label string, embedding array<double>",
    ).write.parquet(os.path.join(str(tmp_path), "embeddings.parquet"))
    with pytest.raises(ValueError, match="fixed-point"):
        REGISTRY["x30_rp_projection"].spark(spark, str(tmp_path))


def test_fuzzy_hot_bucket_both_paths_and_cap_prefilters(spark):
    """The size-split pair expansion must produce all C(n,2) pairs on
    both sides of the threshold (small = in-row array, large =
    streamed chained explodes), and the bucket cap must drop the hot
    bucket before any pair is built."""
    from ravelytics_spark.operators.fuzzy import (
        _PAIR_STREAM_THRESHOLD,
        fuzzy_self_pairs,
    )

    for n in (300, _PAIR_STREAM_THRESHOLD + 200):
        df = spark.createDataFrame(
            [(i, "same-name") for i in range(n)], "id long, s string"
        )
        pairs = fuzzy_self_pairs(df, "id", "s")
        assert pairs.count() == n * (n - 1) // 2, n
    capped = fuzzy_self_pairs(df, "id", "s", max_bucket_size=100)
    assert capped.count() == 0


def test_store_absent_classifier_legacy_and_structured():
    from ravelytics_spark.streaming.dedup_stream import _is_store_absent

    class Structured(Exception):
        def __init__(self, cond):
            self._c = cond
            super().__init__("whatever text")

        def getCondition(self):
            return self._c

    assert _is_store_absent(Structured("PATH_NOT_FOUND"))
    assert not _is_store_absent(Structured("INTERNAL_ERROR"))
    # pre-error-class builds: plain prose, matched by PREFIX only
    assert _is_store_absent(Exception("Path does not exist: s3://x/y"))
    assert _is_store_absent(Exception("Unable to infer schema for Parquet"))
    assert _is_store_absent(Exception("[PATH_NOT_FOUND] Path does not exist"))
    assert not _is_store_absent(
        Exception("connection reset; note: Path does not exist was seen")
    )
