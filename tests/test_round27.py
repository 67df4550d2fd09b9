"""Property tests for the round-27 live registrations (x227-x234).

Oracle parity is swept automatically by tests/test_oracle_catalog.py
(these entries register directly into REGISTRY); here live the
semantic properties an oracle twin cannot express — capped-winnowing
recall on planted span dupes, NN-graph edge conservation, index
base-month identities, interpolation pass-through."""

from __future__ import annotations

import pytest

from ravelytics_spark.plans import round27 as R27
from ravelytics_spark.plans.queries import REGISTRY

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


# ---------------------------------------------------------------------------
# x227 — capped winnowing: recall on planted dupes, boilerplate shed
# ---------------------------------------------------------------------------


def _winnow_pairs_over(spark, rows):
    """Run the capped pipeline over an in-memory documents frame by
    monkey-free substitution: build the frame, reuse the module's
    fingerprint + cap + pair stages directly."""
    import pyspark.sql.functions as F

    d = spark.createDataFrame(rows, "doc_id long, text string")
    fps = R27.winnow_fingerprints(d)
    hot = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > R27._WC_CAP)
        .select("fp")
    )
    kept = fps.join(F.broadcast(hot), "fp", "left_anti")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
        .collect()
    )


def test_winnow_capped_keeps_two_doc_span_dupes(spark):
    """A verbatim span shared by exactly TWO documents survives the
    hot-bucket cap (cap only sheds fingerprints shared by > cap docs):
    the planted 200-char common span >> w+k-1 = 31 chars guarantees
    >= 3 shared fingerprints, so the pair must be emitted."""
    span = "the quick brown fox jumps over the lazy dog " * 5  # 225 chars
    rows = [
        (1, "unique preamble alpha %s unique tail one" % span),
        (2, "different lead-in beta %s other ending two" % span),
        (3, "totally unrelated text about warehouse analytics " * 8),
        (4, "another unrelated document on spark physical plans " * 8),
    ]
    pairs = {(r.doc_a, r.doc_b) for r in _winnow_pairs_over(spark, rows)}
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


def test_winnow_capped_sheds_corpus_boilerplate(spark):
    """A span shared by MORE than cap documents (license-header
    boilerplate) must produce ZERO pairs: its fingerprints exceed the
    cap and are dropped before the join — the 100 TB quadratic-bucket
    guarantee. The uncapped x150 form, by contrast, pairs every
    combination."""
    boiler = "this standard license header is reproduced verbatim " * 5
    n = R27._WC_CAP + 2  # strictly more docs than the cap
    rows = [(i, f"doc {i} body distinct-{i} {boiler} trail-{i}") for i in range(n)]
    pairs = _winnow_pairs_over(spark, rows)
    assert pairs == []


def test_winnow_capped_is_subset_of_uncapped(spark, sf_dir):
    """On the real corpus the capped pair set is a subset of x150's,
    and any dropped pair lost only hot fingerprints."""
    capped = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in REGISTRY["x227_winnow_capped"].spark(spark, sf_dir).collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in REGISTRY["x150_winnow_dup_spans"].spark(spark, sf_dir).collect()
    }
    assert set(capped) <= set(full)
    for k, n in capped.items():
        assert n <= full[k]


# ---------------------------------------------------------------------------
# x228 — stockout projection invariants
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_stockout_overshoot_positive_and_dated(spark, sf):
    rows = REGISTRY["x228_stockout_projection"].spark(spark, sf).collect()
    assert rows, "some part must deplete at every SF"
    for r in rows:
        assert r.overshoot > 0
        assert r.stock_qty >= 0
        assert str(r.depletion_date) >= R27._SO_SPLIT


# ---------------------------------------------------------------------------
# x229 — price index: base month is the identity index
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_price_index_base_month_identity(spark, sf):
    rows = {
        r.m: r for r in REGISTRY["x229_price_index"].spark(spark, sf).collect()
    }
    base = rows[R27._PI_BASE]
    assert base.laspeyres_ppm == 1_000_000
    assert base.paasche_ppm == 1_000_000
    assert base.fisher_idx == pytest.approx(1_000_000.0, abs=0.01)
    # Fisher is the geometric mean: always between L and P
    for r in rows.values():
        lo, hi = sorted((r.laspeyres_ppm, r.paasche_ppm))
        assert lo - 1 <= r.fisher_idx <= hi + 1


# ---------------------------------------------------------------------------
# x230 — hubness: k-NN edge conservation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_hubness_edges_conserved(spark, sf):
    """Every valid vector emits exactly K outgoing edges (n > K at both
    SFs), so sum(indeg * n_vecs) == K * sum(n_vecs) — in-degrees just
    redistribute the same edge mass."""
    rows = REGISTRY["x230_hubness_audit"].spark(spark, sf).collect()
    n_total = sum(r.n_vecs for r in rows)
    edge_mass = sum(r.indeg * r.n_vecs for r in rows)
    assert n_total > R27._HUB_K
    assert edge_mass == R27._HUB_K * n_total


# ---------------------------------------------------------------------------
# x231 — runs test vs a driver-side replay
# ---------------------------------------------------------------------------


def test_runs_test_matches_python_replay(spark):
    import duckdb

    sf = SFS[1]
    con = duckdb.connect()
    daily = con.execute(
        f"SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n "
        f"FROM '{sf}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    by_year: dict[int, list[int]] = {}
    for d, n in daily:
        by_year.setdefault(d.year, []).append(n)
    expect = {}
    for yr, ns in by_year.items():
        signs = []
        for prev, cur in zip(ns, ns[1:]):
            if cur != prev:
                signs.append(1 if cur > prev else -1)
        n1 = signs.count(1)
        n2 = signs.count(-1)
        runs = sum(
            1 for i, s in enumerate(signs) if i == 0 or signs[i - 1] != s
        )
        if n1 > 0 and n2 > 0 and 2 * n1 * n2 > n1 + n2:
            expect[yr] = (n1, n2, runs)
    got = {
        r.yr: (r.n1, r.n2, r.runs)
        for r in REGISTRY["x231_runs_test"].spark(spark, sf).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# x232 — interpolation: anchors pass through, spans are contiguous
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_interpolation_anchor_passthrough_and_contiguity(spark, sf):
    rows = REGISTRY["x232_linear_interpolation"].spark(spark, sf).collect()
    by_nat: dict[int, list] = {}
    for r in rows:
        by_nat.setdefault(r.nationkey, []).append(r)
    assert rows, "at least one nation has >= 1 anchor in the window"
    for nat, rs in by_nat.items():
        rs.sort(key=lambda r: r.day)
        # the emitted span is contiguous days between the nation's
        # first and last anchor
        days = [r.day for r in rs]
        assert all(
            (b - a).days == 1 for a, b in zip(days, days[1:])
        ), f"gap in nation {nat}"
        # boundary rows are anchors (no extrapolation)
        assert rs[0].is_interp == 0 and rs[-1].is_interp == 0
        for r in rs:
            if r.is_interp == 0:
                assert r.value_milli % 1000 == 0  # exact cents * 1000


# ---------------------------------------------------------------------------
# x233 — bucket balance: conservation + pair-mass consistency with x91
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_bucket_balance_conservation(spark, sf):
    rows = REGISTRY["x233_lsh_bucket_balance"].spark(spark, sf).collect()
    assert len(rows) == R27._BB_BANDS
    n_docs = {r.n_docs for r in rows}
    assert len(n_docs) == 1, "every band holds every signed document once"
    for r in rows:
        assert r.max_bucket >= 1
        assert r.n_buckets <= r.n_docs
        # pair mass is zero iff every bucket is a singleton
        assert (r.cand_pairs == 0) == (r.n_buckets == r.n_docs)
        assert r.mega_buckets == 0 or r.max_bucket > R27._BB_MEGA


# ---------------------------------------------------------------------------
# x234 — OOV: ppm bounds and vocabulary coverage monotonicity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_oov_rate_bounds(spark, sf):
    rows = REGISTRY["x234_oov_rate"].spark(spark, sf).collect()
    assert rows
    for r in rows:
        assert 0 <= r.oov_ppm <= 1_000_000
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_ppm == r.n_oov * 1_000_000 // r.n_tokens
