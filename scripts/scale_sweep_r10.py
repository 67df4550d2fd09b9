"""Round-9 scale sweep: the round-29 live registrations + round-30
staged operators at 1x/10x/100x.

Reuses scale_sweep_r6's scaled-directory builder and scale_sweep_r9's
events replica. Shapes worth watching (overflow / lineage /
densification):

* x275/x289 — bounded month/day frames; the fact-side aggs must scale
  linearly, the inference algebra is constant-size.
* x277 — distinct-score-group frame grows with customers (scores are
  near-unique cents); the segment-partitioned cumulative window is
  the documented certifiable form.
* x282/x290 — the user-partitioned lead window is the dominant cost;
  the cell frames stay |etypes|^2.
* x283 — the ABC cumulative window over parts is the documented
  global-window certifiable form (x219 bucketed rank = scale path).
* x293 — same shape as x91: the banded candidate join dominates;
  replica-disjoint docs keep candidates linear.
* x294 — the (doc, win) distinct agg is the cost: 2 window ids per
  token, bounded 50-token groups.
* x278 — two edge-keyed join+agg rounds off one checkpointed edge
  list.

    python scripts/scale_sweep_r10.py [factors...]   # default 1 10 100
    SWEEP_ONLY=a,b,c to restrict entries
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ravelytics_spark.session import get_spark  # noqa: E402
from scripts.scale_sweep_r6 import build_dir  # noqa: E402
from scripts.scale_sweep_r9 import ensure_events  # noqa: E402

# (entry, max factor) — None = unrestricted
ENTRIES = [
    ("x230b_hubness_bucketed", None),
    ("x245b_twonn_bucketed", None),
    ("x275_ljung_box", None),
    ("x276_jarque_bera", None),
    ("x277_pr_auc", None),
    ("x278_hits_scores", None),
    ("x279_grubbs_test", None),
    ("x280_fd_violations", None),
    ("x281_benford_second_digit", None),
    ("x282_markov_transitions", None),
    ("x283_abc_xyz_matrix", None),
    ("x284_price_elasticity", None),
    ("x285_kaplan_meier", None),
    ("x286_newsvendor", None),
    ("x287_pot_gpd", None),
    ("x288_lognormal_fit", None),
    ("x289_dickey_fuller", None),
    ("x290_entropy_rate", None),
    ("x291_cochran_armitage", None),
    ("x292_smd_balance", None),
    ("x293_minhash_calibration", None),
    ("x294_mattr", None),
    ("x295_keyness_llr", None),
    ("x296_fleiss_kappa", None),
    ("x297_cramers_v_matrix", None),
    ("x298_poisson_dispersion", None),
    ("x299_zipf_slope", None),
    ("x300_turning_points", None),
    ("x301_friedman_test", None),
    ("x302_gamma_mom", None),
    ("x303_hoover_index", None),
    ("x304_interarrival_cv2", None),
    ("x305_records_test", None),
    ("x306_skyline_parts", None),
    ("x307_cronbach_alpha", None),
    ("x308_brown_forsythe", None),
    ("x309_pacf", None),
    ("x310_cohens_d", None),
    ("x311_binary_segmentation", None),
    # round-31 staged (targets the round-11 window)
    ("x312_bigram_logprob", None),
    ("x313_taylor_law", None),
    ("x314_eoq", None),
    ("x315_abc_migration", None),
    ("x316_stl_strength", None),
    ("x317_confusion_at_threshold", None),
    ("x318_t_closeness", None),
    ("x319_horvitz_thompson", None),
    ("x320_qte_deciles", None),
    ("x321_degree_powerlaw", None),
    ("x322_simpson_diversity", None),
    ("x323_logrank_test", None),
    ("x324_icc_design_effect", None),
    ("x325_inequality_trend", None),
]


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(
        app_name="scale_sweep_r10",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ravelytics_spark.plans.queries import REGISTRY
    from ravelytics_spark.plans.round30_staged import STAGED
    from ravelytics_spark.plans.round31_staged import STAGED as STAGED31

    catalog = {**REGISTRY, **STAGED, **STAGED31}
    only = {n for n in os.environ.get("SWEEP_ONLY", "").split(",") if n}
    for factor in factors:
        d = build_dir(spark, factor)
        ensure_events(spark, factor, d)
        print(f"-- {factor}x", flush=True)
        for name, cap in ENTRIES:
            if only and name not in only:
                continue
            if cap is not None and factor > cap:
                print(f"    {name:36s}   capped", flush=True)
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
