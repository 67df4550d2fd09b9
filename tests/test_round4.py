"""Targeted property tests for the round-4 operators (the oracle
catalog sweep in test_oracle_catalog.py covers hash parity; these pin
the semantic claims the oracles can't express directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ravelytics_spark.plans.round4 import (
    _KNUTH,
    _RP_DIMS,
    _WIN,
    x28_domain_cap,
    x31_window_dedup,
)
from ravelytics_spark.operators.skew import salted_agg, salted_left_join

SF = "/root/testdata/sf0.001"


def test_domain_cap_never_exceeds_cap(spark):
    out = x28_domain_cap(spark, SF)
    per_source = out.groupBy("source").count().collect()
    assert per_source, "cap output is empty"
    assert all(r["count"] <= 50 for r in per_source)
    # kept docs are the largest per source: max rn == count for each source
    mx = out.groupBy("source").agg(F.max("rn").alias("m"), F.count("*").alias("n"))
    assert all(r["m"] == r["n"] for r in mx.collect())


def test_window_dedup_flags_planted_duplicate(spark):
    base = " ".join(f"tok{i}" for i in range(_WIN + 4))
    df = spark.createDataFrame(
        [
            (1, base + " tailA"),
            (2, base + " tailB"),  # shares every window of `base` with doc 1
            (3, " ".join(f"uniq{i}" for i in range(_WIN + 4))),
        ],
        "doc_id long, text string",
    )
    import os
    import tempfile

    tmp = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    out = {r["doc_id"]: r for r in x31_window_dedup(spark, tmp).collect()}
    # docs 1 and 2 share the (_WIN+4 - _WIN + 1) windows of `base`
    shared_expected = 5
    assert out[1]["n_shared"] == shared_expected
    assert out[2]["n_shared"] == shared_expected
    assert out[3]["n_shared"] == 0
    assert out[3]["n_windows"] == 5


def test_salted_join_agg_equals_plain_on_hot_key(spark):
    # 90% of rows on one hot key — the shape AQE-less salting exists for.
    big = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 3 % 101).cast("double").alias("v"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("g"), (F.col("id") % 5)).alias("grp")
    )
    plain = (
        big.join(small, "k", "left")
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum(F.col("v").cast("decimal(28,4)")).alias("s"))
    )
    salted = salted_agg(
        salted_left_join(big, small, "k", buckets=8),
        ["grp"],
        {
            "n": (F.count("*"), F.sum("n")),
            "s": (F.sum(F.col("v").cast("decimal(28,4)")), F.sum("s")),
        },
        buckets=8,
    )
    p = {r["grp"]: (r["n"], r["s"]) for r in plain.collect()}
    s = {r["grp"]: (r["n"], r["s"]) for r in salted.collect()}
    assert p == s


def test_rp_sign_matrix_is_balanced_and_deterministic(spark):
    # The implicit sign matrix must be ~balanced per output dim (else the
    # projection collapses toward the input mean direction).
    rows = []
    for i in range(64):
        for j in range(_RP_DIMS):
            k = i * _RP_DIMS + j
            bit = ((k * _KNUTH) % 4294967296 // 65536) % 2
            rows.append((j, 1 if bit == 0 else -1))
    for j in range(_RP_DIMS):
        s = sum(v for jj, v in rows if jj == j)
        assert abs(s) <= 16, f"dim {j} sign sum {s} too imbalanced"
