"""Where does a fresh invocation spend its time?  For each query:

  t_build — REGISTRY[name].spark(spark, sf_dir): Python plan
            construction + any bounded .first()/.collect() probes +
            eager localCheckpoint materialization
  t_plan  — first access to the executed plan string (Catalyst
            analysis/optimization + physical planning; driver-side)
  t_exec  — noop sink on the already-planned DataFrame (codegen + run)
  t_exec2 — second noop (steady-state execution, codegen cached)

Run: python scripts/breakdown_r12.py name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from ravelytics_spark.plans.queries import REGISTRY
    from ravelytics_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(
        app_name="ravelytics_breakdown_r12",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    print(f"{'query':32s}{'build':>8s}{'plan':>8s}{'exec':>8s}{'exec2':>8s}")
    for name in names:
        # warm codegen/JIT for this query once so exec is steady-state
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        t0 = time.perf_counter()
        df = REGISTRY[name].spark(spark, sf_dir)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        print(
            f"{name:32s}{t1 - t0:8.3f}{t2 - t1:8.3f}{t3 - t2:8.3f}"
            f"{t4 - t3:8.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
