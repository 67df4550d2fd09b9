"""Time DataFrame BUILD (plan construction, no execution) per headline
query — the driver-side py4j-chatter probe (guide §7.3). Run twice per
query; report the second (warm) build.

    python scripts/buildtime_r12.py [name ...]
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
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in REGISTRY]

    spark = get_spark(
        app_name="ravelytics_buildtime_r12",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    rows = []
    for name in names:
        t0 = time.perf_counter()
        REGISTRY[name].spark(spark, sf_dir)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        REGISTRY[name].spark(spark, sf_dir)
        warm = time.perf_counter() - t0
        rows.append((warm, cold, name))
    rows.sort(reverse=True)
    for warm, cold, name in rows:
        print(f"{name:32s} warm_build={warm:6.3f}s cold={cold:6.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
