"""Oracle-comparison + semantic tests for the round-35 STAGED batch
(x356-x360, registration deferred to round 12): the query-planner's
arithmetic — Bloom prefilter, stats-based file skipping, Wasserstein
drift, sequenceMatch, join-cardinality estimation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ravelytics_spark.plans.round35_staged import (
    _BF_M,
    _FS_HI,
    _FS_LO,
    STAGED,
)
from ravelytics_spark.sources.tables import load_table
from ravelytics_spark.testing import compare, duckdb_connection

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("name", sorted(STAGED))
@pytest.mark.parametrize("sf_dir", SFS)
def test_round35_staged_matches_oracle(spark, name, sf_dir):
    entry = STAGED[name]
    assert entry.oracle is not None
    con = duckdb_connection(sf_dir)
    problems = compare(
        entry.spark(spark, sf_dir),
        con,
        entry.oracle,
        name,
        strict_row_order=True,
    )
    assert not problems, problems


def test_round35_registered_in_round12():
    """The round-12 registration footer flipped: the whole batch is
    live in REGISTRY (same Query objects, not copies)."""
    from ravelytics_spark.plans.queries import REGISTRY

    assert len(STAGED) == 5
    for n, qy in STAGED.items():
        assert REGISTRY.get(n) is qy, f"{n} not registered"


# ---------------------------------------------------------------------------
# Semantic properties the oracle twin cannot express
# ---------------------------------------------------------------------------


def test_bloom_has_no_false_negatives_and_sane_fpr(spark):
    """The Bloom contract: EVERY member key passes its own filter (no
    false negatives — checked by probing members through the same
    word table), and the measured FPR is within 5x of the theoretical
    (1 - e^(-kn/m))^k."""
    sf = SFS[1]
    row = STAGED["x356_bloom_prefilter"].spark(spark, sf).collect()[0]
    assert 0 < row.bits_set <= min(3 * row.n_members, _BF_M)
    k, n, m = 3, row.n_members, _BF_M
    theo = (1 - math.exp(-k * n / m)) ** k
    measured = row.n_false_pos / max(row.n_probes, 1)
    assert measured <= max(5 * theo, 0.01), (measured, theo)
    # no false negatives: run the probe side against member keys
    from ravelytics_spark.plans import round35_staged as R

    c = load_table(spark, sf, "customer")
    members = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    # swap the probe set for the member set by reusing the builder
    # internals: every member must hit all three bits
    mpos = None

    def pos(i):
        return F.conv(
            F.substring(F.md5(F.col("k").cast("string")), 1 + 4 * i, 4),
            16,
            10,
        ).cast("long")

    for i in range(3):
        part = members.select(pos(i).alias("pos"))
        mpos = part if mpos is None else mpos.unionAll(part)
    words = mpos.groupBy(F.expr("pos DIV 32").alias("w")).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)))"
        ).alias("bits")
    )
    checked = members
    for i in range(3):
        wi = words.select(
            F.col("w").alias(f"w{i}"), F.col("bits").alias(f"bits{i}")
        )
        checked = checked.join(
            F.broadcast(wi),
            (pos(i) / F.lit(32)).cast("long") == F.col(f"w{i}"),
            "left",
        ).withColumn(
            f"hit{i}",
            F.coalesce(
                F.expr(
                    f"shiftright(bits{i}, CAST("
                    f"conv(substring(md5(CAST(k AS STRING)), {1 + 4 * i}, 4),"
                    f" 16, 10) % 32 AS INT)) & 1"
                ),
                F.lit(0),
            )
            == 1,
        )
    misses = checked.filter(
        ~(F.col("hit0") & F.col("hit1") & F.col("hit2"))
    ).count()
    assert misses == 0, f"Bloom false negatives: {misses}"


def test_file_skipping_sorted_layout_prunes_more(spark):
    """The point of the entry: under the sorted layout the touched
    files collapse to the predicate's quantile span; natural order
    touches (almost) everything. Also verify the touched counts
    against a direct recomputation."""
    sf = SFS[1]
    rows = {r.layout: r for r in STAGED["x357_file_skipping"].spark(spark, sf).collect()}
    nat, srt = rows["natural"], rows["sorted"]
    assert nat.files_total == srt.files_total
    assert srt.files_touched < nat.files_touched
    # sorted touched files ~= matching-row span / rows-per-file
    d = load_table(spark, sf, "documents").filter(F.col("n_chars").isNotNull())
    matching = d.filter(
        (F.col("n_chars") >= _FS_LO) & (F.col("n_chars") <= _FS_HI)
    ).count()
    assert srt.files_touched <= matching // 100 + 2


def test_wasserstein_detects_planted_shift(spark, tmp_path):
    """A +$20,000 uniform shift of the BUILDING segment moves W1 by
    ~200 grid units: the metric responds proportionally to transport
    distance — the property KS saturates on. (The shift must dominate
    the ~29-cell sampling noise W1 carries between two ~30k-sample
    empirical CDFs on a 5000-cell grid.)"""
    sf = SFS[1]
    base = STAGED["x358_wasserstein_w1"].spark(spark, sf).collect()[0]
    out = str(tmp_path / "shifted")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    bld = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    shifted = (
        o.join(F.broadcast(bld), o.o_custkey == bld.c_custkey, "left")
        .withColumn(
            "o_totalprice",
            F.when(
                bld.c_custkey.isNotNull(), F.col("o_totalprice") + 20_000.0
            ).otherwise(F.col("o_totalprice")),
        )
        .drop(bld.c_custkey)
    )
    shifted.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    c.write.mode("overwrite").parquet(f"{out}/customer.parquet")
    moved = STAGED["x358_wasserstein_w1"].spark(spark, out).collect()[0]
    delta = moved.w1_milligrid - base.w1_milligrid
    # $20k = 200 grid cells of transport per unit mass; triangle
    # inequality bounds the move within the base noise either side
    assert 140_000 <= delta <= 260_000, (
        base.w1_milligrid,
        moved.w1_milligrid,
    )


def test_sequence_match_counts_are_consistent(spark):
    row = STAGED["x359_sequence_match"].spark(spark, SFS[1]).collect()[0]
    assert 0 < row.n_with_both <= row.n_users
    assert 0 <= row.n_matched <= row.n_with_both
    assert row.match_ppm == row.n_matched * 1_000_000 // row.n_with_both


def test_join_cardinality_identity_and_estimate_quality(spark):
    """actual_pairs equals the REAL join count (the sum-c-squared
    identity), and the top-100 + uniform-tail estimate lands within
    25% on TPC-H's near-uniform part keys."""
    sf = SFS[1]
    row = STAGED["x360_join_cardinality"].spark(spark, sf).collect()[0]
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_partkey").isNotNull()
    )
    a = li.select(F.col("l_partkey").alias("k"), F.lit(1).alias("one"))
    real = a.alias("x").join(a.alias("y"), "k").count()
    assert row.actual_pairs == real
    assert abs(row.err_ppm) < 250_000
    assert row.est_pairs <= row.actual_pairs  # uniform tail underestimates
