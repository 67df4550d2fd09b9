"""Behavioral tests for the round-8 scale-infrastructure operators:
Z-order skipping bounds, bloom-prune reduction factor, PageRank
invariants, DSIR separation of the target domain.

(Cross-engine value parity for all four is covered by the oracle
catalog sweep in test_oracle_catalog.py / scripts/gate.py.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ravelytics_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.01"


def test_zorder_buckets_bound_both_dims(spark):
    """bucket = z >> 16 keeps the top 8 bits of each dimension, so every
    bucket must confine x AND y to a 256-wide range — the property that
    makes min-max skipping work on both columns."""
    rows = REGISTRY["x41_zorder_layout"].spark(spark, SF).collect()
    assert len(rows) > 10
    for r in rows:
        assert r.x_max - r.x_min <= 255
        assert r.y_max - r.y_min <= 255


def test_zorder_prunes_most_buckets_for_range_predicate(spark):
    """A ~10%-of-domain predicate on either column should overlap only a
    small fraction of buckets (each bucket spans ≤256 of 1500 custkeys /
    ≤256 of ~2400 day numbers)."""
    rows = REGISTRY["x41_zorder_layout"].spark(spark, SF).collect()
    n = len(rows)
    hit_x = sum(1 for r in rows if r.x_max >= 100 and r.x_min < 250)
    hit_y = sum(1 for r in rows if r.y_max >= 400 and r.y_min < 640)
    assert hit_x / n < 0.5
    assert hit_y / n < 0.5
    # and the two predicates TOGETHER prune harder than either alone
    hit_xy = sum(
        1
        for r in rows
        if r.x_max >= 100 and r.x_min < 250 and r.y_max >= 400 and r.y_min < 640
    )
    assert hit_xy < min(hit_x, hit_y)


def test_bloom_prune_reduces_fact_rows(spark):
    """The bloom pre-filter must pass all matching rows (oracle equality
    covers exactness) while dropping the vast majority of the fact."""
    from ravelytics_spark.plans.round8 import _bloom_bits
    from ravelytics_spark.sources.tables import load_table

    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    dim = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    b1, b2 = _bloom_bits(F.col("o_orderkey"))
    bits = dim.select(F.explode(F.array(b1, b2)).alias("b")).distinct()
    p1, p2 = _bloom_bits(F.col("l_orderkey"))
    pruned = (
        li.withColumn("__b1", p1)
        .withColumn("__b2", p2)
        .join(F.broadcast(bits), F.col("__b1") == F.col("b"), "left_semi")
        .join(F.broadcast(bits), F.col("__b2") == F.col("b"), "left_semi")
    )
    total = li.count()
    kept = pruned.count()
    matching = li.join(
        dim.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi"
    ).count()
    assert kept >= matching  # no false drops
    assert kept < total / 5  # substantial reduction (selective window)


def test_pagerank_invariants_and_partition_independence(spark):
    out = REGISTRY["x43_pagerank"].spark(spark, SF)
    rows = out.collect()
    assert all(r.pagerank > 0 for r in rows)
    mass = sum(r.pagerank for r in rows)
    # dangling leak only — mass stays in (0.5, 1.0001]
    assert 0.5 < mass <= 1.0001
    # top node is better-connected than the median one
    ranks = sorted(r.pagerank for r in rows)
    assert ranks[-1] > ranks[len(ranks) // 2]


def test_dsir_separates_target_domain(spark):
    """The method's point: target-domain (en) docs must score higher on
    the target-vs-raw log-likelihood ratio than off-domain docs."""
    from ravelytics_spark.sources.tables import load_table

    w = REGISTRY["x40_dsir_weight"].spark(spark, SF)
    d = load_table(spark, SF, "documents").select("doc_id", "lang")
    j = w.join(d, "doc_id")
    means = {
        r.grp: r.m
        for r in j.groupBy(
            F.when(F.col("lang") == "en", "en").otherwise("other").alias("grp")
        )
        .agg(F.avg("dsir_logratio").alias("m"))
        .collect()
    }
    assert means["en"] > means["other"]
