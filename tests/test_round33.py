"""Oracle-comparison + semantic tests for the round-33 portable
twins: the md5/fixed-point re-expressions that close the gaps the
existing twin set (x96-x99, x105) leaves around three harness-only
entries (x3 IVF ANN, x62 PQ ANN, x63/x7 HLL registers), letting the
driver hash-certify each ALGORITHM end to end."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ravelytics_spark.plans.queries import REGISTRY
from ravelytics_spark.sources.tables import load_table
from ravelytics_spark.testing import compare, duckdb_connection

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
NAMES = [
    "x342_ivf_portable",
    "x343_pq_portable",
    "x344_hll_portable",
]

# each twin certifies the algorithm of this harness-only entry
# (x9_stratified_sample's twin is the pre-existing x99_sample_portable)
TWINS = {
    "x342_ivf_portable": "x3_ivf_topk",
    "x343_pq_portable": "x62_pq_topk",
    "x344_hll_portable": "x63_hll_rollup",
    "x99_sample_portable": "x9_stratified_sample",
}


@pytest.mark.parametrize("name", NAMES)
@pytest.mark.parametrize("sf_dir", SFS)
def test_round33_matches_oracle(spark, name, sf_dir):
    entry = REGISTRY[name]
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


def test_every_twin_points_at_a_live_harness_entry():
    for twin, harness in TWINS.items():
        assert REGISTRY[twin].oracle is not None, twin
        assert REGISTRY[harness].oracle is None, harness


# ---------------------------------------------------------------------------
# x342 / x343 — ANN semantics vs exact brute force
# ---------------------------------------------------------------------------


def _exact_topk(spark, sf_dir, k=10):
    """Brute-force fixed-point d2 to the same probe (min vec_id of the
    max-width vectors), the twins' ground truth. k=None collects every
    distance (a plain unordered collect — TakeOrdered with a huge k
    would size its heap by k and OOM)."""
    from ravelytics_spark.plans.round33 import _d2_to_lits, _f3, _fixed_vectors

    d, cents = _fixed_vectors(spark, sf_dir)
    probe = cents[0][1]
    e = load_table(spark, sf_dir, "embeddings")
    scored = e.filter(F.size("embedding") == F.lit(d)).select(
        "vec_id", _d2_to_lits(_f3(), probe).alias("d2")
    )
    if k is None:
        return scored.collect()
    return scored.orderBy("d2", "vec_id").limit(k).collect()


def test_ivf_results_are_true_distances_with_recall(spark):
    """Every returned (vec_id, d2) is the TRUE exact distance (the
    re-rank is exact), and 4/16-cell probing keeps recall@10 >= 0.5 on
    the shipped corpus — including the probe itself at d2 = 0."""
    sf = SFS[1]
    got = REGISTRY["x342_ivf_portable"].spark(spark, sf).collect()
    truth = {r.vec_id: r.d2 for r in _exact_topk(spark, sf)}
    exact_d2 = {r.vec_id: r.d2 for r in _exact_topk(spark, sf, k=None)}
    assert len(got) == 10
    for r in got:
        assert exact_d2[r.vec_id] == r.d2
    assert got[0].d2 == 0  # the probe finds itself
    hits = sum(1 for r in got if r.vec_id in truth)
    assert hits >= 5, f"IVF recall@10 collapsed: {hits}/10"


def test_pq_results_are_true_distances_with_recall(spark):
    """PQ's shortlist is approximate but the re-rank is exact: each
    output distance equals brute force, and recall@10 >= 0.5."""
    sf = SFS[1]
    got = REGISTRY["x343_pq_portable"].spark(spark, sf).collect()
    truth = {r.vec_id: r.d2 for r in _exact_topk(spark, sf)}
    exact_d2 = {r.vec_id: r.d2 for r in _exact_topk(spark, sf, k=None)}
    assert len(got) == 10
    for r in got:
        assert exact_d2[r.vec_id] == r.d2
    assert got[0].d2 == 0
    hits = sum(1 for r in got if r.vec_id in truth)
    assert hits >= 5, f"PQ recall@10 collapsed: {hits}/10"


# ---------------------------------------------------------------------------
# x344 — HLL estimator semantics
# ---------------------------------------------------------------------------


def test_hll_estimate_tracks_exact(spark):
    """The raw estimate (no small-range correction) stays within 25%
    of exact for months with enough distinct keys to leave the
    linear-counting regime, and register counts are sane."""
    sf = SFS[1]
    rows = REGISTRY["x344_hll_portable"].spark(spark, sf).collect()
    assert rows
    m = 256
    for r in rows:
        assert 1 <= r.filled <= m
        assert r.z_scaled > 0
        est = r.raw_est_milli / 1000.0
        # raw HLL is only trusted above ~2.5m; below that the (excluded)
        # linear-counting branch would take over
        if r.exact_distinct >= 3 * m:
            rel = abs(est - r.exact_distinct) / r.exact_distinct
            assert rel < 0.25, (r.month, est, r.exact_distinct)


def test_hll_registers_merge_invariant(spark):
    """max-rho registers are order/partitioning-free: computing the
    month rollup under a different shuffle width gives identical
    certified columns (the uniqMerge associativity x63 promises)."""
    sf = SFS[0]
    a = REGISTRY["x344_hll_portable"].spark(spark, sf)
    b = a.repartition(3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# non-multiple-of-8 width: the re-rank domain must be ALL d dims
# ---------------------------------------------------------------------------


def _odd_width_corpus(tmp_path):
    """A 40-vector corpus of width 60 (60 % 8 == 4): the PQ subspace
    grid covers only 56 dims, so any re-rank that slices to the grid
    width diverges from the oracle's full-width rr CTE. Values are
    multiples of 0.25 — exact in float32 AND at 3-dp fixed point, so
    the decimal(9,3) chain is bit-identical across engines."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n, d = 40, 60
    vecs = [
        [((i * 7 + j * 13) % 41) * 0.25 for j in range(d)] for i in range(n)
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 5 for i in range(n)], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    return con


@pytest.mark.parametrize("name", ["x342_ivf_portable", "x343_pq_portable"])
def test_ann_twins_survive_non_multiple_of_8_width(spark, tmp_path, name):
    """Regression for the round-11 ADVICE finding: x343's exact re-rank
    sliced f3 to (d//8)*8 dims while the oracle re-ranked over all d —
    hash parity held only because shipped embeddings are width 64. Both
    twins must now agree with their oracles on a width-60 corpus."""
    con = _odd_width_corpus(tmp_path)
    entry = REGISTRY[name]
    problems = compare(
        entry.spark(spark, str(tmp_path)),
        con,
        entry.oracle,
        name,
        strict_row_order=True,
    )
    assert not problems, problems
