"""Round-7 scale sweep: the round-26 staged operators at 1x/10x/100x.

Reuses scale_sweep_r6's scaled-directory builder (key-offset replicas,
replica-disjoint truth). Expected shapes worth watching per the sweep
checklist (memory: overflow / applyInPandas / lineage / densification):

* x195 — replicas copy p_brand verbatim, so each of the ~25 per-brand
  rank windows holds factor-x rows (2.4M at 100x): the documented
  "outsized group" regime whose scale path is operators/ranks.py
  bucketed form. Measure the window form honestly here.
* x201 — replicas copy text verbatim, so fingerprint cluster sizes
  multiply by the factor and the dup band saturates at 3+; output
  stays <= 8 x 3 cells (bounded, not quadratic — unlike x179 the
  join is on the fingerprint, never pairwise).
* x197 checksum bound at 100x replicas: custkey offsets reach ~1e9,
  x31 summed over 4.5M kept draws ~ 1.4e17 < BIGINT.

    python scripts/scale_sweep_r8.py [factors...]    # default 1 10 100
    SWEEP_ONLY=a,b,c to restrict entries
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ravelytics_spark.session import get_spark  # noqa: E402
from scripts.scale_sweep_r6 import build_dir  # noqa: E402

WORK = "/tmp/ravelytics_scale_sweep_r6"  # shared replicas with r6/r7

ENTRIES = [
    "x194_k_anonymity",
    "x195_winsorized_stats",
    "x195_winsorized_stats@bucketed",  # the selectable scale path
    "x196_feature_hashing",
    "x197_negative_sampling",
    "x198_profile_drift",
    "x199_entity_holdout",
    "x200_discrete_hazard",
    "x201_curation_matrix",
    "x202_contribution_capping",
    "x203_l_diversity",
    "x204_class_reweighting",
    "x205_judge_agreement",
    "x206_gdpr_erasure",
    "x207_near_zero_variance",
    "x208_loo_target_encoding",
    "x209_temporal_split_audit",
    "x210_readability",
    "x211_stratified_kfold",
    "x212_simpson_reversal",
    "x213_churn_label_sensitivity",
    "x214_mrr_eval",
    "x215_calibration_ece",
    "x216_boilerplate_score",
    "x217_contamination_width_curve",
    "x218_dedup_spillover_matrix",
    "x219_quantile_normalization",
    "x219_quantile_normalization@bucketed",
    "x220_srm_check",
    "x221_pvm_bridge",
    "x222_mixture_feasibility",
    "x223_context_length_curve",
    "x224_effective_token_mass",
    "x225_diff_in_diff",
    "x226_cuped_audit",
]


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="scale_sweep_r8")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ravelytics_spark.plans.round26_staged import STAGED

    only = {n for n in os.environ.get("SWEEP_ONLY", "").split(",") if n}
    for factor in factors:
        d = build_dir(spark, factor)
        print(f"-- {factor}x", flush=True)
        for name in ENTRIES:
            if only and name not in only:
                continue
            base, _, variant = name.partition("@")
            kwargs = {"rank_method": variant} if variant else {}
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                STAGED[base].spark(spark, d, **kwargs).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best or 9e9, time.perf_counter() - t0)
            print(f"    {name:36s} {best:8.2f}s", flush=True)

    if os.environ.get("SWEEP_KEEP", "") != "1":
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
