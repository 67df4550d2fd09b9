"""Driver-contract ordering: the certification-priority rotation that
closes the driver's bounded verification window over rounds.

Invariants: uncertified-oracle entries lead (tier 0), harness-only
follow (tier 1), already-certified trail (tier 2); when a new
CORRECTNESS_r*.json certifies more entries, they rotate back and the
next uncertified batch moves into the window."""

from __future__ import annotations

import importlib.util
import json
import sys


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "_entry_under_test", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tier_ordering_invariants():
    mod = _load_entry()
    from ravelytics_spark.plans.queries import REGISTRY

    names = mod._ordered_names()
    assert set(names) == set(REGISTRY)
    cert = mod._certified_names()

    def tier(n):
        if REGISTRY[n].oracle is not None and n not in cert:
            return 0
        return 1 if REGISTRY[n].oracle is None else 2

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), "tiers must be contiguous ascending"
    # round-1-certified entries are all in the trailing tier
    for n in mod._R1_CERTIFIED:
        assert tier(n) == 2
    # oracle_sql covers exactly the oracle-backed entries, same order
    osql = mod.oracle_sql()
    assert list(osql) == [n for n in names if REGISTRY[n].oracle is not None]


def test_new_certifications_rotate_out_of_the_window(tmp_path, monkeypatch):
    mod = _load_entry()
    names_before = mod._ordered_names()
    tier0_before = [n for n in names_before if n not in mod._certified_names()]
    window = names_before[:50]

    # simulate the driver certifying this round's window
    fake = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
        for n in window
    }
    p = tmp_path / "CORRECTNESS_r02.json"
    p.write_text(json.dumps(fake))
    import glob as _glob

    monkeypatch.setattr(
        mod.glob, "glob", lambda pattern: [str(p)] if "CORRECTNESS_r" in pattern else _glob.glob(pattern)
    )

    names_after = mod._ordered_names()
    cert_after = mod._certified_names()
    assert set(window) <= cert_after
    # every newly-certified entry moved behind every still-uncertified
    # oracle entry
    still = [n for n in tier0_before if n not in cert_after]
    if still:
        last_uncertified = max(names_after.index(n) for n in still)
        first_newly = min(names_after.index(n) for n in window)
        # newly-certified oracle entries sit after ALL uncertified ones
        from ravelytics_spark.plans.queries import REGISTRY

        for n in window:
            if REGISTRY[n].oracle is not None:
                assert names_after.index(n) > last_uncertified, n
    sys.modules.pop("_entry_under_test", None)


def test_round8_window_contents_pinned():
    """Pin exactly which entries the round-8 driver CORRECTNESS window
    (first 50 of the priority order) will cover, so certification-queue
    arithmetic is a test, not hope. Round-scoped pins are retired when
    their round closes (the round-7 pin went stale the moment
    CORRECTNESS_r07.json landed and certified its own window — a pin
    must describe the UPCOMING window, not a past one).

    Round-8 state: 9 oracle entries registered late in round 7
    (x184-x193 tail, minus harness-only x192) lead, then the 33
    round-26 staged entries in registration order, then the 8
    round-27 live registrations (x227-x234) = exactly 50 uncertified
    oracle entries — the window is fully subscribed, harness entries
    rotate behind it this round."""
    mod = _load_entry()
    from ravelytics_spark.plans.queries import REGISTRY
    from ravelytics_spark.plans.round26_staged import STAGED as _S26

    names = mod._ordered_names()
    cert = mod._certified_names()
    window = names[:50]

    r7_leftover = [
        "x184_dup_cluster_sizes", "x185_xyz_classes",
        "x186_growth_accounting", "x187_session_paths",
        "x188_embedding_audit", "x189_seasonal_decomp",
        "x190_rolling_market_corr", "x191_apriori_triples",
        "x193_vocab_growth",
    ]
    staged_oracle = [n for n, q in _S26.items() if q.oracle is not None]
    round27 = [
        "x227_winnow_capped", "x228_stockout_projection",
        "x229_price_index", "x230_hubness_audit", "x231_runs_test",
        "x232_linear_interpolation", "x233_lsh_bucket_balance",
        "x234_oov_rate",
    ]
    expected_uncertified = r7_leftover + staged_oracle + round27

    uncertified_oracle = [
        n for n in names if REGISTRY[n].oracle is not None and n not in cert
    ]
    assert uncertified_oracle == expected_uncertified, (
        "the round-8 uncertified-oracle backlog drifted — if new entries "
        "were registered this round, extend the pin; if a CORRECTNESS "
        "file landed, retire this pin and write the round-9 one"
    )
    assert len(expected_uncertified) <= 50, (
        f"{len(expected_uncertified)} uncertified oracle entries "
        "oversubscribe the 50-slot window — stop registering or accept "
        "a round-9 drain"
    )
    # every uncertified oracle entry leads the window, then harness
    # entries fill the remaining slots (rows-only checks are still
    # new signal; certified entries never shadow either)
    k = len(expected_uncertified)
    assert window[:k] == expected_uncertified
    for n in window[k:]:
        assert REGISTRY[n].oracle is None, (
            f"certified entry {n} shadows a harness slot"
        )
