"""Round-12 optimization profiler: steady-state per-query timing + plan
capture under the SAME session shape as bench.py.

    python scripts/profile_r12.py [--tag before|after] [--runs N] [name ...]

For each named query (default: bench.py's HEADLINE set, slowest-first by
the last bench record): build the DataFrame, write
plans/r12/<name>_<tag>.txt (explain "formatted"), then time the noop
sink ``runs`` times and report min/median. The first run of each query
is discarded as the codegen/JIT warmup (bench.py's min-of-n already
embodies this); min over the remaining runs is the steady-state number.

Output: one line per query ``name  min  median  runs`` plus a JSON dump
to /tmp/profile_r12_<tag>.json for diffing.
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
    tag = "before"
    runs = 4
    if "--tag" in argv:
        i = argv.index("--tag")
        tag = argv[i + 1]
        del argv[i : i + 2]
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    no_plan = "--no-plan" in argv
    if no_plan:
        argv.remove("--no-plan")

    from ravelytics_spark.plans.queries import REGISTRY
    from ravelytics_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = argv
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in REGISTRY]

    spark = get_spark(
        app_name="ravelytics_profile_r12",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    plan_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(plan_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        if name not in REGISTRY:
            print(f"{name}: NOT IN REGISTRY, skipped")
            continue
        if not no_plan:
            df = REGISTRY[name].spark(spark, sf_dir)
            qe = df._jdf.queryExecution()
            plan = qe.explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(plan)
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"r12 {tag} {name} run{i}")
            # Rebuild per run, timing build + execute, exactly like
            # bench.run_one: eager localCheckpoints materialize at build
            # time, so a build-once loop would undercount those queries.
            t0 = time.perf_counter()
            df = REGISTRY[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        steady = sorted(times[1:]) if len(times) > 1 else times
        mn = steady[0]
        med = steady[len(steady) // 2]
        results[name] = {"times": times, "min": mn, "median": med}
        print(f"{name:32s} min={mn:7.3f} med={med:7.3f} all={times}")

    with open(f"/tmp/profile_r12_{tag}.json", "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
