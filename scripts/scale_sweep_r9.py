"""Round-8 scale sweep: the round-27 live entries + round-28 staged
operators at 1x/10x/100x.

Reuses scale_sweep_r6's scaled-directory builder (key-offset replicas,
replica-disjoint truth) and extends it with an events replica (user and
event ids offset per replica, timestamps verbatim) for the engagement
entries. Shapes worth watching per the sweep checklist (overflow /
applyInPandas / lineage / densification):

* x227/x150 — documents text is salted per replica (r{k}x tokens), so
  winnowing fingerprints are replica-disjoint: candidate pairs scale
  linearly, and the hot-bucket cap must NOT fire on replica salt.
* x239 — the global customer rank is the documented single-partition
  certifiable form; measure it honestly (the x219 bucketed rank is the
  selectable scale path for the same shape).
* x230/x245 — exact all-pairs gram certification forms: factor-capped
  at 1x BY DESIGN (quadratic in vectors; 41 s at plain sf0.1). Their
  docstrings route the production path through SRP buckets.
* x251 — replicas are part-disjoint, so per-part buy/sell streams keep
  their length: the interval join must scale linearly.
* x236 — part-month EWMA frames are replica-disjoint; linear.

    python scripts/scale_sweep_r9.py [factors...]    # default 1 10 100
    SWEEP_ONLY=a,b,c to restrict entries
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ravelytics_spark.session import get_spark  # noqa: E402
from scripts.scale_sweep_r6 import SF_DIR, build_dir  # noqa: E402

WORK = "/tmp/ravelytics_scale_sweep_r6"  # shared replicas with r6/r7/r8

# (entry, max factor) — None = unrestricted
ENTRIES = [
    ("x227_winnow_capped", None),
    ("x228_stockout_projection", None),
    ("x229_price_index", None),
    ("x230_hubness_audit", 1),
    ("x231_runs_test", None),
    ("x232_linear_interpolation", None),
    ("x233_lsh_bucket_balance", None),
    ("x234_oov_rate", None),
    ("x235_percent_of_parent", None),
    ("x236_croston_intermittent", None),
    ("x237_hurst_rs", None),
    ("x238_psi_stability", None),
    ("x239_gains_table", None),
    ("x240_brier_decomposition", None),
    ("x241_auc_exact", None),
    ("x242_burrows_delta", None),
    ("x243_vocab_coverage_curve", None),
    ("x244_phrase_dictionary_gain", None),
    ("x245_twonn_intrinsic_dim", 1),
    ("x246_label_propagation", None),
    ("x247_link_prediction", None),
    ("x248_keyspace_density", None),
    ("x249_round_number_bias", None),
    ("x250_quota_sample_shortfall", None),
    ("x251_fifo_cost_basis", None),
    ("x252_mcnemar_judges", None),
    ("x253_moment_profile", None),
    ("x254_hill_tail_index", None),
    ("x255_diag_mahalanobis", None),
    ("x256_active_stickiness", None),
    ("x257_l28_histogram", None),
    ("x258_time_decay_attribution", None),
    ("x259_anova_oneway", None),
    ("x260_extreme_value_gumbel", None),
    ("x261_capture_recapture", None),
    ("x262_modularity_score", None),
    ("x263_adamic_adar", None),
    ("x264_degree_assortativity", None),
    ("x265_clustering_coefficient", None),
    ("x266_kendall_w", None),
    ("x267_sax_symbols", None),
    ("x268_theil_decomposition", None),
    ("x269_dkw_bands", None),
    ("x270_spc_control_chart", None),
    ("x271_kruskal_wallis", None),
    ("x272_chao1_unseen", None),
    ("x273_mann_kendall", None),
    ("x274_cpk_capability", None),
    # round-9 live registrations: the SRP-bucketed production twins of
    # the capped all-pairs forms above — UNRESTRICTED on purpose: their
    # whole reason to exist is a linear-ish 10x/100x row (candidate
    # mass <= N * 500 once the per-bucket cap binds). Note the 100x
    # replicas are exact duplicates, so x245b's d1=0 exclusion empties
    # its estimator output there — the timing is still the honest cost
    # of the candidate+top-2 pipeline.
    ("x230b_hubness_bucketed", None),
    ("x245b_twonn_bucketed", None),
]


def ensure_events(spark, factor: int, out_dir: str) -> None:
    """Replica events: user/event ids offset per replica, ts verbatim
    (replica-disjoint users, so engagement truths scale additively)."""
    path = f"{out_dir}/events.parquet"
    done = f"{out_dir}/.events_done"
    if os.path.exists(done):
        return
    rep = spark.range(factor).select(F.col("id").alias("__rep"))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    (
        ev.crossJoin(F.broadcast(rep))
        .withColumn(
            "event_id", F.col("event_id") + F.col("__rep") * 1_000_000_000
        )
        .withColumn(
            "user_id", F.col("user_id") + F.col("__rep") * 10_000_000
        )
        .drop("__rep")
        .repartition(max(2, factor // 2))
        .write.mode("overwrite")
        .parquet(path)
    )
    open(done, "w").close()


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(
        app_name="scale_sweep_r9",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ravelytics_spark.plans.queries import REGISTRY
    from ravelytics_spark.plans.round28_staged import STAGED

    catalog = {**REGISTRY, **STAGED}
    only = {n for n in os.environ.get("SWEEP_ONLY", "").split(",") if n}
    for factor in factors:
        d = build_dir(spark, factor)
        ensure_events(spark, factor, d)
        print(f"-- {factor}x", flush=True)
        for name, cap in ENTRIES:
            if only and name not in only:
                continue
            if cap is not None and factor > cap:
                print(f"    {name:36s}   capped (quadratic cert form)",
                      flush=True)
                continue
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                catalog[name].spark(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best or 9e9, time.perf_counter() - t0)
            print(f"    {name:36s} {best:8.2f}s", flush=True)


if __name__ == "__main__":
    main()
