"""Round-11 scale sweep: the round-35 staged batch at 1x/10x/100x
(pre-registration, per the staging contract).

Shapes worth watching:

* x356 — word table fixed at 2048 rows at any scale; probe map-only.
* x357 — the layout windows are global sorts (the write-path cost the
  layout itself pays); watch they stay the only corpus-sized step.
* x358 — value-domain frame bounded at ~5000 grid cells; the overflow
  headroom note in the docstring is the thing the 100x run checks.
* x359 — per-user pair join: replicas keep per-user event counts
  constant, so candidate pairs grow linearly with users.
* x360 — histogram + TakeOrdered(100); the join never runs.

    python scripts/scale_sweep_r35.py [factors...]   # default 1 10 100
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
        app_name="scale_sweep_r35",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ravelytics_spark.plans.round35_staged import STAGED

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
