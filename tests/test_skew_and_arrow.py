"""Skew utilities match their unsalted equivalents; Arrow cosine kernel
matches the native HOF kernel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ravelytics_spark.operators import skew
from ravelytics_spark.operators.similarity import cosine_topk
from ravelytics_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + long tail
    rows = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    return spark.createDataFrame(rows, ["k", "v"])


def test_salted_agg_equals_plain_agg(spark, skewed):
    plain = {
        (r.k): (r.n, r.s, r.mx)
        for r in skewed.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.s, r.mx)
        for r in skew.salted_agg(
            skewed,
            ["k"],
            {
                "n": (F.count("*"), F.sum("n")),
                "s": (F.sum("v"), F.sum("s")),
                "mx": (F.max("v"), F.max("mx")),
            },
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], ["k", "label"]
    )
    plain = sorted(
        (r.k, r.v, r.label) for r in skewed.join(dim, "k", "left").collect()
    )
    salted = sorted(
        (r.k, r.v, r.label) for r in skew.salted_left_join(skewed, dim, "k").collect()
    )
    assert salted == plain


def test_top_keys_finds_hot_key(spark, skewed):
    hot = skew.top_keys(skewed, "k", min_fraction=0.5)
    rows = hot.collect()
    assert len(rows) == 1 and rows[0].k == "hot" and rows[0]["count"] == 900


def test_arrow_cosine_matches_native(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    probe = [1.0 if i % 16 == 0 else 0.0 for i in range(64)]
    native = [
        (r.vec_id, round(r.cos_sim, 9))
        for r in cosine_topk(e, "embedding", probe, k=20, impl="native").collect()
    ]
    arrow = [
        (r.vec_id, round(r.cos_sim, 9))
        for r in cosine_topk(e, "embedding", probe, k=20, impl="arrow").collect()
    ]
    assert [i for i, _ in native] == [i for i, _ in arrow]
    for (_, a), (_, b) in zip(native, arrow):
        assert a == pytest.approx(b, abs=1e-9)
