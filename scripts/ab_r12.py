"""Interleaved A/B timing for round-12 optimizations.

    python scripts/ab_r12.py [--pairs N] name ...

The box shows multi-minute slow phases (10x on untouched queries —
see OPTIMIZATION_r12.md), so sequential before/after runs lie. This
harness alternates variant A (fan_out_scan monkeypatched to identity —
the pre-change plan) and variant B (current code) within one session,
so an ambient phase hits both variants symmetrically. Reports min and
median per variant per query.

Only valid for changes gated on fan_out_scan; for other changes, copy
the pattern with the relevant toggle.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    argv = sys.argv[1:]
    pairs = 3
    if "--pairs" in argv:
        i = argv.index("--pairs")
        pairs = int(argv[i + 1])
        del argv[i : i + 2]
    names = argv

    import ravelytics_spark.operators.skew as skew
    from ravelytics_spark.plans.queries import REGISTRY
    from ravelytics_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="ravelytics_ab_r12",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    real_fan_out = skew.fan_out_scan

    def run(name: str, variant: str) -> float:
        skew.fan_out_scan = (
            real_fan_out if variant == "B" else (lambda df, min_factor=2: df)
        )
        spark.sparkContext.setJobDescription(f"ab {name} {variant}")
        t0 = time.perf_counter()
        df = REGISTRY[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, dict] = {}
    for name in names:
        # one unmeasured warmup of each variant (codegen/JIT)
        run(name, "A")
        run(name, "B")
        a_times, b_times = [], []
        for _ in range(pairs):
            a_times.append(run(name, "A"))
            b_times.append(run(name, "B"))
        a_min, b_min = min(a_times), min(b_times)
        out[name] = {"A": a_times, "B": b_times}
        print(
            f"{name:32s} A_min={a_min:7.3f} B_min={b_min:7.3f} "
            f"speedup={a_min / b_min if b_min else 0:5.2f}x  "
            f"A={a_times} B={b_times}"
        )
    skew.fan_out_scan = real_fan_out
    with open("/tmp/ab_r12.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
