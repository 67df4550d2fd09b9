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


def test_round7_window_contents_pinned():
    """Pin exactly which entries the round-7 driver CORRECTNESS window
    (first 50 of the priority order) will cover, so certification-queue
    arithmetic is a test, not hope: all 14 live-but-never-windowed
    oracle entries (x130-x143) land first, then the staged batch in
    registration order; no already-certified entry shadows an
    uncertified one."""
    mod = _load_entry()
    from ravelytics_spark.plans.queries import REGISTRY

    names = mod._ordered_names()
    cert = mod._certified_names()
    window = names[:50]

    live_backlog = [
        "x130_lorenz_deciles", "x131_funnel_latency",
        "x132_segment_migration", "x133_shipmode_latency",
        "x134_hhi_revenue", "x135_weekday_index", "x136_discount_bands",
        "x137_share_of_total", "x138_volatility_bands",
        "x139_new_vs_returning", "x140_char_trigram_profile",
        "x141_penny_allocation", "x142_last_touch_attribution",
        "x143_qhist_portable",
    ]
    assert window[:14] == live_backlog

    # every window slot is an uncertified oracle entry — no certified
    # or harness entry wastes a slot while oracle backlog remains
    uncertified_oracle = [
        n for n in names if REGISTRY[n].oracle is not None and n not in cert
    ]
    assert window == uncertified_oracle[:50]
    # the remainder queued for round 8 is small enough for one window
    leftover = [n for n in uncertified_oracle if n not in window]
    never_windowed_harness = [
        n
        for n in names
        if REGISTRY[n].oracle is None
        and n in ("x151_stream_interval_join", "x161_late_data_watermark",
                  "x192_compression_quality")
    ]
    # the round-8 window must absorb the leftover backlog PLUS the
    # round-26 staged batch that registers then (x194-x223) — count
    # the staged module too, or staging could silently oversubscribe
    # the next window (the round-6 lesson: 59 uncertified > 50 slots
    # took two rounds to drain)
    from ravelytics_spark.plans.round26_staged import STAGED as _S26

    staged_oracle = [n for n, q in _S26.items() if q.oracle is not None]
    total_round8 = (
        len(leftover) + len(never_windowed_harness) + len(staged_oracle)
    )
    assert total_round8 <= 50, (
        f"{len(leftover)} leftover oracle + "
        f"{len(never_windowed_harness)} harness + "
        f"{len(staged_oracle)} round-26 staged entries would overflow "
        "the round-8 window — stop staging or accept a round-9 drain"
    )
