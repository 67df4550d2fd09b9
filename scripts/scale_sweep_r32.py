"""Round-10 scale sweep: the round-32 staged batch at 1x/10x/100x.

Reuses scale_sweep_r6's scaled-directory builder (key-offset replicas,
replica-disjoint truth) and scale_sweep_r9's events replica (user and
event ids offset per replica, timestamps verbatim). Shapes worth
watching per the sweep checklist (overflow / explode factors /
densification):

* x326 — the covered-hours explode is a CONSTANT factor (<= 24); the
  distinct (ttl, user, h) frame grows linearly in users.
* x328 — session-hour explode bounded by real session durations;
  replica users are disjoint, so session counts scale additively.
* x332/x339 — 3-dp fixed point keeps n*s2 - s1^2 under 2^63 through
  200k vectors (the 6-dp x107 scale would overflow the variance key).
* x333 — kilodollar units: replica days stack revenue 100x, dollar^2
  detail sums would graze 2^63.
* x335 — month explode bounded by each order's real shelf life.
* x336 — the 65x replicate explode runs on the CUSTOMER aggregate,
  so its input is |customers|, not |orders|.

    python scripts/scale_sweep_r32.py [factors...]   # default 1 10 100
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

ENTRIES = [
    "x326_state_ttl_projection",
    "x327_gap_sensitivity",
    "x328_peak_concurrency",
    "x329_microbatch_profile",
    "x330_neyman_allocation",
    "x331_bh_fdr",
    "x332_embedding_energy",
    "x333_haar_energy",
    "x334_periodogram_peak",
    "x335_open_order_backlog",
    "x336_permutation_test",
    "x337_wilson_intervals",
    "x338_unicode_class_profile",
    "x339_dim_redundancy",
    "x340_calibration_slope",
]


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(
        app_name="scale_sweep_r32",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ravelytics_spark.plans.round32_staged import STAGED

    only = {n for n in os.environ.get("SWEEP_ONLY", "").split(",") if n}
    for factor in factors:
        d = build_dir(spark, factor)
        ensure_events(spark, factor, d)
        print(f"-- {factor}x", flush=True)
        for name in ENTRIES:
            if only and name not in only:
                continue
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                STAGED[name].spark(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best or 9e9, time.perf_counter() - t0)
            print(f"    {name:36s} {best:8.2f}s", flush=True)


if __name__ == "__main__":
    main()
