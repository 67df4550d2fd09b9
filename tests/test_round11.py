"""Behavioral tests for the round-11 operators: epoch-cap invariants,
survivorship policy, fertility bounds, band-filter coverage.

(Cross-engine value parity is covered by the oracle catalog sweep.)
"""

from __future__ import annotations

from ravelytics_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.01"


def test_mix_epochs_capped_and_budget_not_exceeded(spark):
    rows = REGISTRY["x50_mix_epochs"].spark(spark, SF).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r.epochs <= 4.0 + 1e-9
        assert r.quota_tokens <= 4.0 * r.n_tokens + 1e-6
    # the cap can only SHRINK the allocation below the budget
    assert sum(r.quota_tokens for r in rows) <= 2_000_000 + 1e-6
    # shares themselves sum to 1
    assert abs(sum(r.p_mix for r in rows) - 1.0) < 1e-4


def test_survivorship_keeps_longest_member(spark):
    rows = REGISTRY["x51_dedup_survivorship"].spark(spark, SF).collect()
    assert len(rows) > 0
    multi = [r for r in rows if r.n_members >= 2]
    for r in rows:
        members = [int(x) for x in r.member_ids.split(",")]
        assert r.survivor_id in members
        assert members == sorted(members)
    # total members across clusters == docs with non-empty canonical form
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_members for r in rows) <= docs
    # at least verify the survivor is never shorter than the cluster's
    # count-weighted minimum requirement (survivor_chars is the max)
    if multi:
        id_to_chars = {
            r.doc_id: r.n_chars
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "n_chars")
            .collect()
        }
        for r in multi[:20]:
            members = [int(x) for x in r.member_ids.split(",")]
            assert r.survivor_chars == max(id_to_chars[m] for m in members)


def test_fertility_at_least_one(spark):
    """A subword tokenizer can only split words, so fertility >= 1
    whenever every word yields at least one BPE-ish token."""
    rows = REGISTRY["x55_tokenizer_fertility"].spark(spark, SF).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r.fertility >= 1.0
        assert r.bpe_tokens >= r.ws_tokens


def test_length_band_keeps_central_mass(spark):
    kept = REGISTRY["x56_length_band_filter"].spark(spark, SF).count()
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    # [p5, p95] keeps ~90%; small per-source groups + discrete lengths
    # allow real slack either side (observed 84.4% at sf0.01)
    assert 0.78 * total <= kept <= 0.97 * total
