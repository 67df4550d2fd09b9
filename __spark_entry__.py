"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship techno-stack query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full t2 catalog from
``ravelytics_spark.plans.queries`` (one entry per SURVEY §2 operator,
each with its DuckDB oracle).

Catalog ordering: the driver verifies a bounded window of entries in
dict order, so entries are emitted in certification-priority order —
(0) oracle-backed entries NOT yet hash-certified in any prior round
(including anything newly added), (1) harness-only entries the driver
has NEVER recorded (rows-only check), (2) harness-only entries with a
record, STALEST round first (so driver rows keep getting refreshed
oldest-first instead of the same early-registered ones each round),
(3) oracle entries already hash-certified in a prior round. Within a
tier, registration order breaks ties.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ravelytics_spark.plans.queries import REGISTRY  # noqa: E402
from ravelytics_spark.session import configure_existing  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"

# Entries hash-certified by the driver in round 1 (CORRECTNESS_r01.json:
# all 50 pass rows+schema+hash). They keep their oracles but yield the
# verification window to not-yet-certified entries.
_R1_CERTIFIED = frozenset(
    {
        "s11_scan_lineitem", "p1_projection", "p2_null_default",
        "p3_filter_nonempty", "p4_filter_notnull", "c1_ts_fallback",
        "c2_date_norm_shape", "c3_conditional", "c4_cast", "j1_left_join",
        "j2_inner_join", "j3_semi_join", "j4_anti_join", "g1_argmax_latest",
        "g2_collect_sorted", "g3_multikey_group", "g4_distinct_sort",
        "g5_counts", "g6_numeric_aggs", "a1_explode", "a2_transform_lower",
        "a3_filter_hof", "a4_a5_flatten_distinct", "a7_array_size",
        "f1_lower", "f2_instr", "f3_rlike", "f4_concat", "f5_substr",
        "f6_length_trim", "d1_yyyymm", "d2_to_date", "d4_iso_roundtrip",
        "m1_json_extract", "o1_topk", "o3_limit", "o4_union_all",
        "o5_chunking", "set_intersect", "set_except", "w1_row_number",
        "w2_rank", "w3_lag", "w4_running_sum", "t_window_daily",
        "flagship_techno_stack", "x1_dedup_exact", "x1b_dedup_rows",
        "x2_ngram_jaccard", "x2_containment",
    }
)


def _correctness_records() -> tuple[frozenset[str], dict[str, int]]:
    """(certified, last_seen): entries hash-certified in ANY prior
    round, and — for every entry with ANY driver-side record at all
    (including harness-only ``no_oracle`` rows-checks) — the LATEST
    round NUMBER (int — parsed from the 'rNN' tag so ordering stays
    correct past round 99, where zero-padded string order would rank
    'r100' < 'r99') that recorded it. Parsed from the driver's
    CORRECTNESS_r*.json files next to this module, so the
    certification window self-adapts every round without editing the
    hardcoded round-1 floor."""
    certified = set(_R1_CERTIFIED)
    last_seen = {name: 1 for name in _R1_CERTIFIED}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        tag = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        try:
            rnum = int(tag.lstrip("r"))
        except ValueError:
            # unexpected filename (e.g. CORRECTNESS_rfinal.json): its
            # hash certifications still count — skipping the whole file
            # would silently DE-certify entries and reshuffle the
            # window (round-11 ADVICE). Only the last_seen ordering
            # update needs a parsable round number.
            rnum = None
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if rnum is not None and rnum > last_seen.get(name, 0):
                last_seen[name] = rnum
            if (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            ):
                certified.add(name)
    return frozenset(certified), last_seen


def _certified_names() -> frozenset[str]:
    return _correctness_records()[0]


def _ordered_names() -> list[str]:
    certified, last_seen = _correctness_records()
    names = list(REGISTRY)

    def key(name: str) -> tuple:
        if REGISTRY[name].oracle is not None:
            # (0) awaiting hash certification, (3) already certified
            tier = 0 if name not in certified else 3
            return (tier, 0, names.index(name))
        # harness-only: a rows-check is still signal — entries the
        # driver has NEVER recorded (in any round) outrank recorded
        # ones (verdict r8 missing #3), and recorded ones re-run
        # STALEST first (verdict r9 missing #2: the r09 window re-ran
        # 5 fresh-ish entries while 13 r04-era records stayed stale,
        # because plain registration order ignored record age)
        if name not in last_seen:
            return (1, 0, names.index(name))
        return (2, last_seen[name], names.index(name))

    return sorted(names, key=key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_existing(spark)
    return REGISTRY["flagship_techno_stack"].spark(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(REGISTRY[name].spark) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (omitted for
    harness-only operators → driver records rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
