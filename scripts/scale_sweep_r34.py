"""Round-11 scale sweep: the round-34 staged batch at 1x/10x/100x
(pre-registration, per the staging contract — catch blowups and
overflows BEFORE the round-12 footer flips).

Reuses scale_sweep_r6's scaled-directory builder. Shapes worth
watching per the sweep checklist:

* x345/x346/x351 — map-only / single-window plans; expect linear.
* x347/x350 — the pair join runs on the BOUNDED monthly frame
  (replicas keep the same months), so cost should be flat in the
  pair stage and linear in the month agg.
* x348/x349 — the two-level ranking: distinct cent values densify
  with replicas; watch the bucket frame stays ~96 rows and nothing
  single-partitions. cnt^3 tie terms: cnt <= N = 15M at 100x ->
  cnt^3 only if a single value dominates (it cannot: prices are
  near-distinct); vc cnt per value stays small.
* x352 — leakage cost tracks the x91 pair generator (already swept);
  the replica corpus multiplies near-dup pairs linearly.
* x353 — per-doc windows; replica docs are disjoint, linear.
* x355 — anti-join on md5(text): replica texts are distinct by
  construction (r{k}x prefixes), so the corpus index grows linearly.

    python scripts/scale_sweep_r34.py [factors...]   # default 1 10 100
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


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(
        app_name="scale_sweep_r34",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ravelytics_spark.plans.round34_staged import STAGED

    only = {n for n in os.environ.get("SWEEP_ONLY", "").split(",") if n}
    for factor in factors:
        d = build_dir(spark, factor)
        print(f"-- {factor}x", flush=True)
        for name in STAGED:
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
