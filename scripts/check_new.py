"""Spot-validate a subset of catalog entries against their DuckDB
oracles (the gate's compare, restricted to names given on argv).

    python scripts/check_new.py x108_cms_heavy_hitters ... [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--sf")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "16")
        # see gate.py: the 1 GiB local default driver heap OOMs at sf0.1
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ravelytics_spark.plans.queries import REGISTRY
    from ravelytics_spark.testing import compare, duckdb_connection

    con = duckdb_connection(sf_dir)
    names = args or [n for n in REGISTRY]
    fails = 0
    for name in names:
        entry = REGISTRY[name]
        t0 = time.time()
        try:
            problems = compare(entry.spark(spark, sf_dir), con, entry.oracle, name)
        except Exception as exc:  # noqa: BLE001
            problems = [f"{name}: {type(exc).__name__}: {exc}"]
        dt = time.time() - t0
        if problems:
            fails += 1
            print(f"FAIL {name} ({dt:.1f}s): {problems[0][:500]}")
        else:
            print(f"ok   {name} ({dt:.1f}s)")
    print(f"{len(names) - fails}/{len(names)} ok")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
