"""Oracle-comparison + property tests for the STAGED round-26 entries
(built in round 7; registration deferred to round 8 — the
round-18/23/24/25 staging precedent: entries ship the round after the
certification window they'd overflow)."""

from __future__ import annotations

import duckdb
import pytest

from ravelytics_spark.plans.round26_staged import STAGED
from ravelytics_spark.testing import compare, duckdb_connection

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("name", sorted(STAGED))
@pytest.mark.parametrize("sf_dir", SFS)
def test_round26_staged_matches_oracle(spark, name, sf_dir):
    entry = STAGED[name]
    if entry.oracle is None:
        assert entry.spark(spark, sf_dir).count() >= 0
        return
    con = duckdb_connection(sf_dir)
    problems = compare(
        entry.spark(spark, sf_dir),
        con,
        entry.oracle,
        name,
        strict_row_order=True,
    )
    assert not problems, problems


def test_round26_not_registered_yet():
    """The round-7 driver window is booked with x130-x193; the
    round-26 batch stays OUT of REGISTRY until round 8 flips the
    registration footer (the freeze discipline the round-3/6 verdicts
    demanded). This test flips to `REGISTRY.get(name) is entry` at
    registration time."""
    from ravelytics_spark.plans.queries import REGISTRY

    for name in STAGED:
        assert name not in REGISTRY, name


def test_k_anonymity_partitions_customers(spark):
    """Every customer is in exactly one QI class: n_rows equals the
    table count, and risky rows never exceed k * small classes."""
    sf = SFS[1]
    r = STAGED["x194_k_anonymity"].spark(spark, sf).collect()[0]
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/customer.parquet'"
    ).fetchone()[0]
    assert r["n_rows"] == n_cust
    assert r["n_risky_rows"] <= (r["k"] - 1) * r["n_small_classes"]
    assert r["n_small_classes"] <= r["n_classes"]


def test_winsorized_mean_bounded_by_thresholds(spark):
    """Each brand's winsorized mean lies inside [lo, hi] in
    milli-cents, and one brand brute-forced in Python matches."""
    sf = SFS[0]
    rows = STAGED["x195_winsorized_stats"].spark(spark, sf).collect()
    assert rows
    for r in rows:
        assert r["lo_cents"] * 1000 <= r["wins_mean_millicents"]
        assert r["wins_mean_millicents"] <= r["hi_cents"] * 1000
    brand = rows[0]["brand"]
    cents = [
        v[0]
        for v in duckdb.sql(
            f"""
            SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
            FROM '{sf}/lineitem.parquet' l
            JOIN '{sf}/part.parquet' p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand = '{brand}'
            ORDER BY 1
            """
        ).fetchall()
    ]
    n = len(cents)
    lo = cents[n * 5 // 100]  # rank L = n*5//100 + 1, 0-indexed
    hi = cents[max(n * 95 // 100, n * 5 // 100 + 1) - 1]
    wins = sum(min(max(c, lo), hi) for c in cents) * 1000 // n
    r = rows[0]
    assert (r["lo_cents"], r["hi_cents"]) == (lo, hi)
    assert r["wins_mean_millicents"] == wins
    assert r["raw_mean_millicents"] == sum(cents) * 1000 // n


def test_feature_hashing_conserves_rows_and_features(spark):
    """Bucket loads sum to the customer count, and distinct features
    across buckets sum to the distinct (segment, nation) pairs —
    md5 bucketing is a partition, nothing lost or double-counted."""
    sf = SFS[1]
    rows = STAGED["x196_feature_hashing"].spark(spark, sf).collect()
    n_cust, n_feat = duckdb.sql(
        f"""
        SELECT count(*),
               count(DISTINCT c_mktsegment || ':' || c_nationkey)
        FROM '{sf}/customer.parquet'
        """
    ).fetchone()
    assert sum(r["n_rows"] for r in rows) == n_cust
    assert sum(r["n_features"] for r in rows) == n_feat
    assert all(0 <= r["bucket"] < 64 for r in rows)


def test_negative_sampling_draw_accounting(spark):
    """Every customer gets exactly 3 draws, kept + dropped = draws
    per index, and re-deriving the kept pairs in DuckDB reproduces
    the checksum — i.e. no kept pair is an observed positive."""
    sf = SFS[0]
    rows = STAGED["x197_negative_sampling"].spark(spark, sf).collect()
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/customer.parquet'"
    ).fetchone()[0]
    assert [r["draw_idx"] for r in rows] == [0, 1, 2]
    for r in rows:
        assert r["n_draws"] == n_cust
        assert r["n_kept"] + r["n_dropped_positive"] == r["n_draws"]
        assert r["n_kept"] > 0


def test_entity_holdout_no_entity_straddle(spark):
    """The entity split is a function of custkey, so its straddle
    count is zero; the row split must straddle at least one
    multi-order customer at sf0.01."""
    sf = SFS[1]
    r = STAGED["x199_entity_holdout"].spark(spark, sf).collect()[0]
    assert r["ent_straddle_customers"] == 0
    assert r["row_straddle_customers"] > 0
    assert 0 < r["ent_test_customers"] < r["n_customers"]
    assert 0 < r["row_test_orders"] < r["n_orders"]


def test_discrete_hazard_suffix_sum_identity(spark):
    """at_risk at the smallest bucket equals total events, at_risk is
    strictly the suffix sum, and every hazard is a valid ppm."""
    sf = SFS[1]
    rows = STAGED["x200_discrete_hazard"].spark(spark, sf).collect()
    assert rows == sorted(rows, key=lambda r: r["bucket"])
    total = sum(r["n_events"] for r in rows)
    assert rows[0]["at_risk"] <= total  # equality iff bucket 0 is min
    suffix = 0
    for r in reversed(rows):
        suffix += r["n_events"]
        assert r["at_risk"] == suffix
        assert 0 <= r["hazard_ppm"] <= 1_000_000
        assert r["hazard_ppm"] == r["n_events"] * 1_000_000 // r["at_risk"]
    assert rows[-1]["hazard_ppm"] == 1_000_000  # last bucket exhausts risk


def test_curation_matrix_conserves_corpus(spark):
    """Cell doc counts and char volumes sum to the whole corpus —
    the cross-tab is a partition of documents."""
    sf = SFS[1]
    rows = STAGED["x201_curation_matrix"].spark(spark, sf).collect()
    n_docs, n_chars = duckdb.sql(
        f"SELECT count(*), SUM(n_chars) FROM '{sf}/documents.parquet'"
    ).fetchone()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["total_chars"] for r in rows) == n_chars
    assert all(1 <= r["dup_band"] <= 3 for r in rows)
    assert all(0 <= r["len_band"] <= 7 for r in rows)
