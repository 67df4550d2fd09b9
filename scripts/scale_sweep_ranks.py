"""Round-7 sweep: the rank_method='window' vs 'bucketed' scale paths
of the four global-window entries (x111 RFM ntiles, x118 per-group
median, x188 norm quantiles, x193 vocab deciles) at 1x/10x/100x of
sf0.1, on the shared replica dirs built by scale_sweep_r6/r7.

The question the sweep answers: at what factor does the
single-partition window form stop being the right default, and does
the bucketed form stay flat enough to be the documented 100 TB path?
Both forms are output-identical (tests/test_ranks.py), so this is
purely a latency/limits measurement.

    python scripts/scale_sweep_ranks.py [factors...]   # default 1 10 100
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ravelytics_spark.session import get_spark  # noqa: E402

WORK = "/tmp/ravelytics_scale_sweep_r6"

ENTRIES = {
    "x111_rfm_segmentation": "ravelytics_spark.plans.round21",
    "x118_exact_median": "ravelytics_spark.plans.round21",
    "x188_embedding_audit": "ravelytics_spark.plans.round25_staged",
    "x193_vocab_growth": "ravelytics_spark.plans.round25_staged",
}


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="scale_sweep_ranks")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import importlib

    fns = {}
    for name, mod_name in ENTRIES.items():
        mod = importlib.import_module(mod_name)
        fns[name] = getattr(mod, name)

    for factor in factors:
        d = f"{WORK}/sf_{factor}x"
        if not os.path.exists(f"{d}/.done"):
            raise SystemExit(
                f"{d} missing — run scripts/scale_sweep_r7.py {factor} first"
            )
        print(f"-- {factor}x", flush=True)
        for name, fn in fns.items():
            for method in ("window", "bucketed"):
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, d, rank_method=method).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                print(
                    f"    {name:24s} {method:8s} {best:7.2f}s", flush=True
                )


if __name__ == "__main__":
    main()
