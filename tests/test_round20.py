"""Round-20 entry tests: DuckDB strict-row-order comparison at two SFs
plus semantic properties for the portable sketch family (KMV / HLL /
hash sampling made oracle-certifiable via a cross-engine hash family)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ravelytics_spark.plans.queries import REGISTRY
from ravelytics_spark.testing import compare, duckdb_connection

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

R20 = [
    "x97_kmv_portable",
    "x98_hll_portable",
    "x99_sample_portable",
    "x100_curation_portable",
    "x101_dup_clusters_portable",
    "x102_srp_portable",
    "x103_triangle_count",
    "x104_equidepth_histogram",
    "x105_pq_portable",
    "x106_interval_overlap",
    "x107_embed_neardup_portable",
]


@pytest.mark.parametrize("name", R20)
@pytest.mark.parametrize("sf_dir", SFS)
def test_round20_entry_matches_oracle(spark, name, sf_dir):
    entry = REGISTRY[name]
    con = duckdb_connection(sf_dir)
    problems = compare(
        entry.spark(spark, sf_dir), con, entry.oracle, name, strict_row_order=True
    )
    assert not problems, problems


@pytest.mark.parametrize("name", R20)
def test_round20_nontrivial_output(spark, name):
    rows = REGISTRY[name].spark(spark, SFS[0]).count()
    assert rows > 0, f"{name} returned no rows at sf0.001"


def test_kmv_estimates_are_actual_estimates(spark):
    """The sketch is a real estimator: every per-source estimate (and
    the merged one) lands within the K=64 KMV error envelope of the
    exact distinct count (sigma ~ 1/sqrt(K-2) ~ 13%; assert 4 sigma)."""
    rows = REGISTRY["x97_kmv_portable"].spark(spark, SFS[1]).collect()
    assert {r.source for r in rows} >= {"(all)"}
    for r in rows:
        assert r.exact_distinct > 0
        rel = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
        assert rel < 0.52, f"{r.source}: rel err {rel:.3f}"


def test_kmv_merged_row_consistent_with_union_semantics(spark):
    """The '(all)' sketch merge can never estimate BELOW the largest
    per-source estimate's support: its h_K is the K-th smallest of the
    union, which is <= every per-source h_K, so est(all) >= max
    per-source est whenever all sketches are saturated."""
    rows = {
        r.source: r
        for r in REGISTRY["x97_kmv_portable"].spark(spark, SFS[1]).collect()
    }
    allrow = rows.pop("(all)")
    assert allrow.est_distinct >= max(r.est_distinct for r in rows.values())
    assert allrow.exact_distinct >= max(
        r.exact_distinct for r in rows.values()
    )


def test_hll_estimates_within_envelope_and_raw_branch(spark):
    """Estimates track exact distincts within the m=64 HLL envelope
    (sigma ~ 1.04/8 = 13%; assert 4 sigma), and at sf0.01 every year is
    big enough that the raw branch (not linear counting) is exercised."""
    rows = REGISTRY["x98_hll_portable"].spark(spark, SFS[1]).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r.exact_custkeys > 0
        rel = abs(r.est_hll - r.exact_custkeys) / r.exact_custkeys
        assert rel < 0.52, f"{r.o_year}: rel err {rel:.3f}"
        assert r.est_hll > 2.5 * 64, "expected the raw-estimate branch"


def test_hll_monthly_merge_equals_direct_yearly_registers(spark):
    """The mergeability contract the entry certifies: max-merging
    monthly registers gives EXACTLY the registers (hence estimate) of
    aggregating the year directly — max is associative, so shard
    rollups are lossless."""
    from ravelytics_spark.sources.tables import load_table

    o = load_table(spark, SFS[1], "orders")
    hv = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    base = o.select(
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        hv.alias("hv"),
    )
    rest = F.expr("hv div 64")
    r = base.select(
        "o_year",
        "o_month",
        F.pmod("hv", F.lit(64)).alias("bucket"),
        F.when(rest == 0, F.lit(55))
        .otherwise(F.lit(55) - F.length(F.bin(rest)))
        .alias("rho"),
    )
    direct = {
        (x.o_year, x.bucket): x.m
        for x in r.groupBy("o_year", "bucket").agg(F.max("rho").alias("m")).collect()
    }
    merged = {
        (x.o_year, x.bucket): x.m
        for x in r.groupBy("o_year", "o_month", "bucket")
        .agg(F.max("rho").alias("m"))
        .groupBy("o_year", "bucket")
        .agg(F.max("m").alias("m"))
        .collect()
    }
    assert direct == merged


def test_sample_portable_is_deterministic_subset_at_strata_rates(spark):
    """Membership is a pure function of doc_id: two runs agree row for
    row, the sample is a subset of the corpus, and per-stratum rates
    land near the requested per-mille targets."""
    from ravelytics_spark.sources.tables import load_table

    q = REGISTRY["x99_sample_portable"]
    a = q.spark(spark, SFS[1]).collect()
    b = q.spark(spark, SFS[1]).collect()
    assert a == b
    docs = {
        r.doc_id: r.lang
        for r in load_table(spark, SFS[1], "documents")
        .select("doc_id", "lang")
        .collect()
    }
    rates = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25}
    n_by_lang: dict[str, int] = {}
    for r in a:
        assert docs[r.doc_id] == r.lang
        n_by_lang[r.lang] = n_by_lang.get(r.lang, 0) + 1
    totals: dict[str, int] = {}
    for lang in docs.values():
        totals[lang] = totals.get(lang, 0) + 1
    for lang, rate in rates.items():
        if totals.get(lang, 0) < 40:
            continue
        got = n_by_lang.get(lang, 0) / totals[lang]
        assert abs(got - rate) < 0.2, f"{lang}: {got:.3f} vs {rate}"


def test_dup_clusters_iterations_reach_fixed_point(spark):
    """One extra propagation round changes nothing at sf0.01 — the
    certified labels ARE the true connected components, not a
    truncation (the x58 convergence contract)."""
    from ravelytics_spark.plans.round19 import portable_minhash_pairs
    from ravelytics_spark.plans.round20 import _CLUSTER_ITERS
    from ravelytics_spark.sources.tables import load_table

    d = load_table(spark, SFS[1], "documents")
    pairs = (
        portable_minhash_pairs(spark, d)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    nodes = (
        pairs.select(F.col("id_a").alias("node"))
        .union(pairs.select(F.col("id_b").alias("node")))
        .distinct()
    )
    edges = (
        pairs.union(
            pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        )
        .union(
            nodes.select(F.col("node").alias("id_a"), F.col("node").alias("id_b"))
        )
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("label"))

    def step(lbls):
        return (
            edges.join(lbls, edges.id_a == lbls.node)
            .groupBy(F.col("id_b").alias("node"))
            .agg(F.min("label").alias("label"))
        )

    for _ in range(_CLUSTER_ITERS):
        labels = step(labels).localCheckpoint(eager=True)
    after = {(r.node, r.label) for r in step(labels).collect()}
    before = {(r.node, r.label) for r in labels.collect()}
    assert after == before, "min-label propagation did not converge"


def test_curation_portable_is_subset_of_deterministic_prefix(spark):
    """The full pipeline only ever DROPS documents relative to the
    deterministic prefix (near-dedup removes, never adds), and every
    surviving row carries identical quality/lang/token values."""
    full = {
        r.doc_id: (r.quality, r.lang_pred, r.n_tokens)
        for r in REGISTRY["x100_curation_portable"].spark(spark, SFS[1]).collect()
    }
    prefix = {
        r.doc_id: (r.quality, r.lang_pred, r.n_tokens)
        for r in REGISTRY["x10_curation_deterministic"].spark(spark, SFS[1]).collect()
    }
    assert set(full) <= set(prefix)
    for doc_id, vals in full.items():
        assert prefix[doc_id] == vals
    dropped = set(prefix) - set(full)
    losers = {
        r.id_b
        for r in REGISTRY["x91_minhash_portable"].spark(spark, SFS[1]).collect()
    }
    # every dropped doc is the higher id of some verified near-dup pair
    # (pairs over CLEANED text can differ from raw-text pairs only via
    # whitespace normalization; on this corpus they coincide)
    assert dropped <= losers


def test_srp_portable_output_shape_and_candidate_recall(spark):
    """Top-k is sorted (cosine desc, vec_id), cosines are valid, and
    the LSH shortlist contains genuinely high-cosine vectors: the best
    SRP candidate is within the top quartile of the brute-force
    ranking (the honest-recall contract of a capped candidate
    generator)."""
    import math as _m

    from ravelytics_spark.plans.round20 import _SRP_K, _SRP_Q
    from ravelytics_spark.sources.tables import load_table

    rows = REGISTRY["x102_srp_portable"].spark(spark, SFS[1]).collect()
    assert len(rows) == _SRP_K
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)
    assert all(-1.0 - 1e-9 <= c <= 1.0 + 1e-9 for c in cosines)
    # brute-force ranking in python
    vecs = (
        load_table(spark, SFS[1], "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    qn = _m.sqrt(sum(v * v for v in _SRP_Q))

    def cos(emb):
        d = sum(float(x) * q for x, q in zip(emb, _SRP_Q))
        n = _m.sqrt(sum(float(x) ** 2 for x in emb))
        return d / (qn * n) if n else 0.0

    ranked = sorted((cos(r.embedding) for r in vecs), reverse=True)
    cutoff = ranked[max(1, len(ranked) // 4) - 1]
    assert rows[0].cosine >= cutoff - 1e-6


def test_triangle_counters_satisfy_graph_invariants(spark):
    """Wedge/triangle counters obey the combinatorial invariants:
    triangles <= wedges (every triangle closes exactly one ordered
    wedge under the total orientation), and the graph is non-trivial
    at sf0.01."""
    row = REGISTRY["x103_triangle_count"].spark(spark, SFS[1]).collect()[0]
    assert row.n_nodes > 0 and row.n_edges > 0
    assert 0 <= row.n_triangles <= row.n_wedges
    # handshake bound: an undirected simple graph has <= C(n,2) edges
    assert row.n_edges <= row.n_nodes * (row.n_nodes - 1) // 2


def test_triangle_count_matches_bruteforce_on_small_graph(spark):
    """Exactness check independent of the oracle: brute-force the
    triangle count in python at sf0.001."""
    from itertools import combinations

    from ravelytics_spark.sources.tables import load_table

    li = load_table(spark, SFS[0], "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order: dict[int, set] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        for u, v in combinations(sorted(parts), 2):
            edges.add((u, v))
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = 0
    for u, v in edges:
        tri += len(adj[u] & adj[v])
    tri //= 3  # each triangle counted once per edge
    row = REGISTRY["x103_triangle_count"].spark(spark, SFS[0]).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_triangles * 3 == tri * 3 and row.n_triangles == tri


def test_equidepth_buckets_are_contiguous_and_balanced(spark):
    """Buckets tile the value range in order without overlap, cover
    every row, and each holds n/8 rows up to fine-bin granularity
    (the equi-depth contract: max bucket error < max fine-bin count)."""
    rows = REGISTRY["x104_equidepth_histogram"].spark(spark, SFS[1]).collect()
    assert [r.bucket for r in rows] == list(range(len(rows)))
    for a, b in zip(rows, rows[1:]):
        assert a.hi_cents <= b.lo_cents
        assert a.lo_cents < a.hi_cents
    total = sum(r.n_rows for r in rows)
    from ravelytics_spark.sources.tables import load_table

    n = load_table(spark, SFS[1], "orders").count()
    assert total == n
    target = n / len(rows)
    # every bucket within 60% of target (fine bins are ~1% of rows each,
    # but the LAST bucket absorbs the floor-assignment remainder)
    for r in rows[:-1]:
        assert abs(r.n_rows - target) / target < 0.6, r


def test_pq_adc_orders_shortlist_usefully(spark):
    """The ADC shortlist is a real approximation: the exact-distance
    top-1 of the PQ result equals the brute-force nearest neighbor
    among the shortlist, distances are nonnegative and sorted, and
    ADC != exact distance (it IS an approximation, not a re-label)."""
    rows = REGISTRY["x105_pq_portable"].spark(spark, SFS[1]).collect()
    assert len(rows) == 5
    dists = [r.dist for r in rows]
    assert dists == sorted(dists)
    assert all(d >= 0 for d in dists)
    assert any(abs(r.adc - r.dist) > 1e-9 for r in rows)


def test_pq_refinement_matches_python_l2(spark):
    """Exact-refinement check independent of the oracle: the reported
    distances equal the python L2 between the 6-dp-rounded vector and
    the query."""
    import math as _m

    from ravelytics_spark.plans.round20 import _PQ_Q
    from ravelytics_spark.sources.tables import load_table

    rows = REGISTRY["x105_pq_portable"].spark(spark, SFS[1]).collect()
    vecs = {
        r.vec_id: r.embedding
        for r in load_table(spark, SFS[1], "embeddings").collect()
    }
    for r in rows:
        emb = vecs[r.vec_id]
        d2 = sum(
            (round(float(x), 6) - q) ** 2 for x, q in zip(emb, _PQ_Q)
        )
        assert abs(_m.sqrt(d2) - r.dist) < 2e-6, (r.vec_id, r.dist)


def test_interval_overlap_pairs_verified_by_bruteforce(spark):
    """Brute-force the overlap pair counts per customer in python at
    sf0.001 and compare exactly."""
    from collections import defaultdict

    from ravelytics_spark.sources.tables import load_table

    o = (
        load_table(spark, SFS[0], "orders")
        .select("o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("s"))
        .collect()
    )
    by_cust = defaultdict(list)
    for r in o:
        by_cust[r.o_custkey].append((r.o_orderkey, r.s))
    want = {}
    for ck, orders in by_cust.items():
        n = tot = 0
        for i in range(len(orders)):
            for j in range(len(orders)):
                if orders[i][0] < orders[j][0]:
                    dd = abs((orders[i][1] - orders[j][1]).days)
                    if dd < 30:
                        n += 1
                        tot += 30 - dd
        if n:
            want[ck] = (n, tot)
    got = {
        r.o_custkey: (r.n_overlaps, r.sum_overlap_days)
        for r in REGISTRY["x106_interval_overlap"].spark(spark, SFS[0]).collect()
    }
    assert got == want


def test_embed_neardup_pairs_are_verified_and_recall_holds(spark):
    """Every emitted pair is ordered, clears tau with an EXACT cosine
    (cross-checked in python), and the banded-LSH recall on this
    corpus is honest: every pair the LSH path emits appears in the
    brute-force >=tau set, and the candidate pruning did not drop the
    single best pair."""
    import math as _m

    from ravelytics_spark.sources.tables import load_table

    rows = REGISTRY["x107_embed_neardup_portable"].spark(spark, SFS[1]).collect()
    assert rows
    vecs = {
        r.vec_id: [round(float(x), 6) for x in r.embedding]
        for r in load_table(spark, SFS[1], "embeddings").collect()
    }

    def cos(a, b):
        fa, fb = vecs[a], vecs[b]
        d = sum(x * y for x, y in zip(fa, fb))
        return d / (
            _m.sqrt(sum(x * x for x in fa)) * _m.sqrt(sum(x * x for x in fb))
        )

    brute = {
        (a, b)
        for a in vecs
        for b in vecs
        if a < b and cos(a, b) >= 0.4 - 1e-9
    }
    got = set()
    for r in rows:
        assert r.id_a < r.id_b
        assert abs(cos(r.id_a, r.id_b) - r.cosine) < 2e-6
        got.add((r.id_a, r.id_b))
    assert got <= brute
    best = max(brute, key=lambda p: cos(*p))
    assert best in got, "banding dropped the single strongest pair"
