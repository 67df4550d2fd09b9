"""Round-19 entry tests: DuckDB strict-row-order comparison at two SFs
plus semantic properties for the portable-hash LSH pair (the round's
headline: MinHash/SimHash candidate generation + verification made
oracle-certifiable via a cross-engine hash family)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ravelytics_spark.plans.queries import REGISTRY
from ravelytics_spark.testing import compare, duckdb_connection

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

R19 = [
    "x91_minhash_portable",
    "x92_simhash_portable",
    "x93_tfidf_cosine_pairs",
    "x94_rollup_reaggregate",
    "x95_pareto_frontier",
    "x96_grid_ivf_topk",
]


@pytest.mark.parametrize("name", R19)
@pytest.mark.parametrize("sf_dir", SFS)
def test_round19_entry_matches_oracle(spark, name, sf_dir):
    entry = REGISTRY[name]
    con = duckdb_connection(sf_dir)
    problems = compare(
        entry.spark(spark, sf_dir), con, entry.oracle, name, strict_row_order=True
    )
    assert not problems, problems


@pytest.mark.parametrize("name", R19)
def test_round19_nontrivial_output(spark, name):
    """Every entry returns rows at sf0.001 — a 0-row certified query
    certifies nothing."""
    rows = REGISTRY[name].spark(spark, SFS[0]).count()
    assert rows > 0, f"{name} returned no rows at sf0.001"


def test_minhash_portable_pairs_are_verified_near_dups(spark):
    """Every emitted pair carries the exact Jaccard, and it clears the
    threshold; pair ids are ordered and distinct."""
    rows = REGISTRY["x91_minhash_portable"].spark(spark, SFS[0]).collect()
    assert rows
    for r in rows:
        assert r.id_a < r.id_b
        assert r.jaccard >= 0.35 - 1e-9


def test_minhash_portable_agrees_with_exact_jaccard_on_found_pairs(spark):
    """For each pair the LSH path emits, recomputing 3-gram Jaccard
    directly must give the same value — verification is not an
    estimate."""
    from ravelytics_spark.functions.text import shingles

    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in REGISTRY["x91_minhash_portable"].spark(spark, SFS[0]).collect()
    }
    docs = spark.read.parquet(SFS[0] + "/documents.parquet").select(
        "doc_id", F.array_distinct(shingles("text", 3)).alias("s")
    )
    sets = {r.doc_id: set(r.s) for r in docs.collect()}
    for (a, b), j in out.items():
        sa, sb = sets[a], sets[b]
        exact = len(sa & sb) / len(sa | sb)
        assert abs(exact - j) < 1e-6, (a, b, exact, j)


def test_simhash_portable_hamming_bound_and_symmetry_free(spark):
    """Emitted pairs respect the radius and the id_a < id_b convention
    with no duplicates."""
    rows = REGISTRY["x92_simhash_portable"].spark(spark, SFS[0]).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0 <= r.hamming <= 3
        assert (r.id_a, r.id_b) not in seen
        seen.add((r.id_a, r.id_b))


def test_tfidf_pairs_share_a_discriminative_bigram(spark):
    """Candidate generation is the inverted index: every emitted pair
    must share at least one bigram that survived the df cut."""
    rows = REGISTRY["x93_tfidf_cosine_pairs"].spark(spark, SFS[0]).collect()
    assert rows
    from ravelytics_spark.functions.text import shingles

    docs = (
        spark.read.parquet(SFS[0] + "/documents.parquet")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", shingles("text", 2).alias("g"))
    )
    grams = {r.doc_id: set(r.g) for r in docs.collect()}
    for r in rows:
        assert grams[r.id_a] & grams[r.id_b], (r.id_a, r.id_b)
        assert 0.12 <= r.cos_sim <= 1.0 + 1e-9


def test_rollup_reaggregate_equals_direct_monthly(spark):
    """The two-level rollup must equal a direct month-level aggregation
    over base rows — the pre-aggregation compose contract."""
    out = REGISTRY["x94_rollup_reaggregate"].spark(spark, SFS[0])
    o = spark.read.parquet(SFS[0] + "/orders.parquet")
    direct = (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )
    got = {(r.month, r.priority): (r.revenue, r.n_orders) for r in out.collect()}
    want = {
        (r.month, r.priority): (r.revenue, r.n_orders) for r in direct.collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


def test_pareto_frontier_strictly_increasing(spark):
    """Within each priority the record prices must be strictly
    increasing over days — the defining skyline property."""
    rows = REGISTRY["x95_pareto_frontier"].spark(spark, SFS[0]).collect()
    assert rows
    by_p: dict = {}
    for r in rows:
        by_p.setdefault(r.priority, []).append((r.day, r.record_price))
    for p, seq in by_p.items():
        assert seq == sorted(seq)
        prices = [x[1] for x in seq]
        assert all(b > a for a, b in zip(prices, prices[1:])), p


def test_grid_ivf_topk_subset_of_probed_cells(spark):
    """Every returned vector must lie in a probed cell, and scores must
    be the exact cosine (spot-checked against the brute-force kernel)."""
    from ravelytics_spark.functions.vectors import cosine
    from ravelytics_spark.plans.round19 import _GRID_PROBE, _GRID_Q

    rows = REGISTRY["x96_grid_ivf_topk"].spark(spark, SFS[0]).collect()
    assert len(rows) == 10
    e = spark.read.parquet(SFS[0] + "/embeddings.parquet")
    vec = F.col("embedding").cast("array<double>")
    cell = sum(
        [
            F.when(F.element_at(vec, d + 1) > 0, F.lit(1 << d)).otherwise(F.lit(0))
            for d in range(4)
        ]
    )
    qv = F.array(*[F.lit(x) for x in _GRID_Q])
    ref = {
        r.vec_id: (r.cell, r.cs)
        for r in e.select(
            "vec_id",
            cell.alias("cell"),
            F.round(cosine("embedding", qv), 4).alias("cs"),
        ).collect()
    }
    for r in rows:
        c, cs = ref[r.vec_id]
        assert c in _GRID_PROBE
        assert r.cos_sim == cs
