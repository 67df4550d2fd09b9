"""Per-stage wall-clock attribution for one query: run it with the UI
enabled and dump every stage's submission->completion time, task count,
and shuffle bytes from the status REST API.

    python scripts/stages_r12.py <query> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from ravelytics_spark.plans.queries import REGISTRY
    from ravelytics_spark.session import get_spark

    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name=f"stages_{name}",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    # warm run (codegen/JIT), then measured run(s)
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{name} run{i}")
        t0 = time.perf_counter()
        df = REGISTRY[name].spark(spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.perf_counter() - t0
        print(f"run{i}: build={t_build:.3f} total={t_total:.3f}")

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.loads(r.read())
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/jobs"
    ) as r:
        jobs = json.loads(r.read())

    # keep only stages from the LAST measured run (jobs whose description
    # matches the final run tag)
    want = {
        s
        for j in jobs
        if (j.get("description") or "").endswith(f"run{runs - 1}")
        for s in j.get("stageIds", [])
    }
    rows = []
    for s in stages:
        if s["stageId"] not in want:
            continue
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        comp = s.get("completionTime")
        from datetime import datetime

        def ts(x):
            return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f")

        dur = (ts(comp) - ts(s.get("submissionTime"))).total_seconds()
        rows.append(
            (
                dur,
                s["stageId"],
                s["numCompleteTasks"],
                s.get("executorRunTime", 0),
                s.get("shuffleWriteBytes", 0),
                s.get("shuffleReadBytes", 0),
                (s.get("description") or s.get("name", ""))[:90],
            )
        )
    rows.sort(reverse=True)
    print(
        f"\n{'wall_s':>7s} {'stage':>5s} {'tasks':>5s} {'runMs':>7s} "
        f"{'shWr':>9s} {'shRd':>9s}  name"
    )
    tot = 0.0
    for dur, sid, nt, rt, sw, sr, nm in rows:
        tot += dur
        print(f"{dur:7.3f} {sid:5d} {nt:5d} {rt:7d} {sw:9d} {sr:9d}  {nm}")
    print(f"sum of stage walls: {tot:.3f} (stages overlap; total above)")
    spark.stop()


if __name__ == "__main__":
    main()
