"""Round-11 scale sweep: the round-33 portable twins at 1x/10x/100x,
plus the x278 re-sweep the round-10 verdict asked for (its 33.7 s r9
row was measured pre-box-reseed).

Reuses scale_sweep_r6's scaled-directory builder (key-offset replicas,
replica-disjoint truth). Shapes worth watching:

* x342/x343 — centroid/codebook collect stays 16 rows at every factor
  (vec_id replicas are offset upward, so the 16 smallest are always
  the rep-0 originals); the scan is map-only, so the sweep measures
  pure per-row argmin/ADC expression cost.
* x344 — sketch rows bounded at (months x days x 256) regardless of
  input rows; the sweep confirms the register aggs stay flat while
  the raw scan grows.
* x278 — the HITS rounds under DISK_ONLY persist; watching whether the
  three join rounds need AQE skew handling at 100x (verdict item #8).

    python scripts/scale_sweep_r33.py [factors...]   # default 1 10 100
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

ENTRIES = [
    "x342_ivf_portable",
    "x343_pq_portable",
    "x344_hll_portable",
    "x278_hits_scores",
]


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(
        app_name="scale_sweep_r33",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ravelytics_spark.plans.queries import REGISTRY

    only = {n for n in os.environ.get("SWEEP_ONLY", "").split(",") if n}
    for factor in factors:
        d = build_dir(spark, factor)
        print(f"-- {factor}x", flush=True)
        for name in ENTRIES:
            if only and name not in only:
                continue
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                REGISTRY[name].spark(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best or 9e9, time.perf_counter() - t0)
            print(f"    {name:36s} {best:8.2f}s", flush=True)


if __name__ == "__main__":
    main()
