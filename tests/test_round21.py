"""Round-21 entry tests: DuckDB strict-row-order comparison at two SFs
plus semantic properties for the warehouse-analytics battery (CMS,
split fingerprints, corpus Jaccard, RFM, Pareto, lift, OLS slope,
Gini, chi-square independence, BM25 scan, exact median, EWMA,
seasonality, mix entropy)."""

from __future__ import annotations

import math

import pytest

from ravelytics_spark.plans.queries import REGISTRY
from ravelytics_spark.testing import compare, duckdb_connection

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

R21 = [
    "x108_cms_heavy_hitters",
    "x109_dataset_split",
    "x110_source_pair_jaccard",
    "x111_rfm_segmentation",
    "x112_pareto_abc",
    "x113_basket_lift",
    "x114_trend_slope",
    "x115_gini_concentration",
    "x116_chi2_independence",
    "x117_bm25_scan",
    "x118_exact_median",
    "x119_ewma_revenue",
    "x120_seasonality_index",
    "x121_entropy_mix",
]


@pytest.mark.parametrize("name", R21)
@pytest.mark.parametrize("sf_dir", SFS)
def test_round21_entry_matches_oracle(spark, name, sf_dir):
    entry = REGISTRY[name]
    con = duckdb_connection(sf_dir)
    problems = compare(
        entry.spark(spark, sf_dir), con, entry.oracle, name, strict_row_order=True
    )
    assert not problems, problems


@pytest.mark.parametrize("name", R21)
def test_round21_nontrivial_output(spark, name):
    rows = REGISTRY[name].spark(spark, SFS[0]).count()
    assert rows > 0, f"{name} returned no rows at sf0.001"


def test_cms_never_underestimates(spark):
    """The defining Count-Min guarantee: every estimate >= exact count
    (collisions only ever add)."""
    rows = REGISTRY["x108_cms_heavy_hitters"].spark(spark, SFS[1]).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.n_cms >= r.n_exact, f"partkey {r.l_partkey}"


def test_split_partitions_the_corpus(spark):
    """Splits are a partition: doc counts sum to the corpus and train
    dominates (96% expected mass)."""
    rows = {r.split: r for r in REGISTRY["x109_dataset_split"].spark(spark, SFS[1]).collect()}
    total = sum(r.n_docs for r in rows.values())
    assert total == 500
    assert rows["train"].n_docs > rows["val"].n_docs
    assert rows["train"].n_docs > rows["test"].n_docs


def test_pair_jaccard_bounds_and_pair_count(spark):
    rows = REGISTRY["x110_source_pair_jaccard"].spark(spark, SFS[1]).collect()
    n_sources = len({r.src_a for r in rows} | {r.src_b for r in rows})
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert 0.0 <= r.jaccard_est <= 1.0
        assert r.n_inter <= r.k_used


def test_rfm_quartiles_are_balanced(spark):
    """ntile(4) marginals differ by at most 1 row per quartile."""
    rows = REGISTRY["x111_rfm_segmentation"].spark(spark, SFS[1]).collect()
    for axis in ("r_q", "f_q", "m_q"):
        marg = {}
        for r in rows:
            marg[getattr(r, axis)] = marg.get(getattr(r, axis), 0) + r.n_customers
        assert set(marg) == {1, 2, 3, 4}
        assert max(marg.values()) - min(marg.values()) <= 1, (axis, marg)


def test_abc_shares_sum_to_one(spark):
    rows = REGISTRY["x112_pareto_abc"].spark(spark, SFS[1]).collect()
    assert [r.abc_class for r in rows] == ["A", "B", "C"]
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-6
    # A captures the most revenue per part by construction
    a, c = rows[0], rows[2]
    assert a.revenue_cents / a.n_parts > c.revenue_cents / c.n_parts


def test_basket_lift_support_bounds(spark):
    rows = REGISTRY["x113_basket_lift"].spark(spark, SFS[1]).collect()
    for r in rows:
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert r.lift > 0


def test_trend_slope_matches_numpy_lstsq(spark):
    """The closed-form integer slope equals float OLS to ~1e-6."""
    import duckdb

    con = duckdb.connect()
    pts = con.execute(
        f"""
        WITH m AS (
            SELECT c_nationkey,
                   (year(o_orderdate) * 12 + month(o_orderdate))
                     - (SELECT min(year(o_orderdate) * 12 + month(o_orderdate))
                        FROM '{SFS[1]}/orders.parquet') AS t,
                   SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
            FROM '{SFS[1]}/orders.parquet'
            JOIN '{SFS[1]}/customer.parquet' ON o_custkey = c_custkey
            GROUP BY c_nationkey, t
        ) SELECT t, CAST(y AS DOUBLE) FROM m WHERE c_nationkey = 0 ORDER BY t
        """
    ).fetchall()
    n = len(pts)
    st = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sty = sum(p[0] * p[1] for p in pts)
    stt = sum(p[0] * p[0] for p in pts)
    expect = (n * sty - st * sy) / (n * stt - st * st)
    rows = REGISTRY["x114_trend_slope"].spark(spark, SFS[1]).collect()
    got = {r.n_name: r.slope_cents_per_month for r in rows}["NATION_0"]
    assert abs(got - expect) < max(1e-6, abs(expect) * 1e-9)


def test_gini_bounds(spark):
    rows = REGISTRY["x115_gini_concentration"].spark(spark, SFS[1]).collect()
    for r in rows:
        assert -1e-9 <= r.gini < 1.0, r


def test_chi2_lattice_is_complete_and_consistent(spark):
    """Full lattice: |cells| = |langs| x |sources|; observed counts sum
    to the corpus; every contribution is non-negative."""
    rows = REGISTRY["x116_chi2_independence"].spark(spark, SFS[1]).collect()
    langs = {r.lang for r in rows}
    sources = {r.source for r in rows}
    assert len(rows) == len(langs) * len(sources)
    assert sum(r.n_obs for r in rows) == 500
    for r in rows:
        assert r.chi2_contrib >= 0
        assert r.expected > 0


def test_chi2_matches_scipy_free_reference(spark):
    """Total statistic equals the textbook chi-square computed in pure
    Python from the same contingency table."""
    rows = REGISTRY["x116_chi2_independence"].spark(spark, SFS[1]).collect()
    rn, cn, tot = {}, {}, 0
    for r in rows:
        rn[r.lang] = rn.get(r.lang, 0) + r.n_obs
        cn[r.source] = cn.get(r.source, 0) + r.n_obs
        tot += r.n_obs
    expect = 0.0
    for r in rows:
        e = rn[r.lang] * cn[r.source] / tot
        expect += (r.n_obs - e) ** 2 / e
    got = sum(r.chi2_contrib for r in rows)
    assert got == pytest.approx(expect, rel=1e-6)


def test_bm25_is_sorted_and_bounded(spark):
    rows = REGISTRY["x117_bm25_scan"].spark(spark, SFS[1]).collect()
    assert len(rows) == 50
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_exact_median_matches_statistics_median(spark):
    import duckdb
    import statistics

    con = duckdb.connect()
    vals = [
        v[0]
        for v in con.execute(
            f"""SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                FROM '{SFS[1]}/orders.parquet'
                WHERE o_orderpriority = '1-URGENT'"""
        ).fetchall()
    ]
    expect = statistics.median(vals)
    rows = REGISTRY["x118_exact_median"].spark(spark, SFS[1]).collect()
    got = {r.o_orderpriority: r.median_cents for r in rows}["1-URGENT"]
    assert got == pytest.approx(float(expect))


def test_ewma_is_a_convex_combination(spark):
    """Each smoothed value lies within [min, max] of the lag values it
    weighs (convexity of the normalized dyadic weights)."""
    rows = REGISTRY["x119_ewma_revenue"].spark(spark, SFS[1]).collect()
    series = {}
    for r in rows:
        series.setdefault(r.n_name, []).append(r)
    for name, rs in series.items():
        rs.sort(key=lambda r: r.mon)
        for i, r in enumerate(rs):
            window = [x.revenue_cents for x in rs[max(0, i - 7) : i + 1]]
            lo, hi = min(window) * 1_000_000, max(window) * 1_000_000
            assert lo - 1_000_000 <= r.ewma_micros <= hi + 1_000_000, (name, r.mon)


def test_seasonality_full_windows_only(spark):
    rows = REGISTRY["x120_seasonality_index"].spark(spark, SFS[1]).collect()
    for r in rows:
        assert r.seasonality_index > 0
    # 12*y/s12 averages to ~12/12=1 across a stationary series
    mean_idx = sum(r.seasonality_index for r in rows) / len(rows)
    assert 0.5 < mean_idx < 2.0


def test_entropy_mix_bounds(spark):
    rows = REGISTRY["x121_entropy_mix"].spark(spark, SFS[1]).collect()
    for r in rows:
        assert -1e-9 <= r.entropy_nats <= math.log(r.n_sources) + 1e-9
