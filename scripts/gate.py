"""One-command correctness gate: every catalog entry through the driver
contract (__spark_entry__) with DuckDB oracle comparison, in a fresh
non-UTC session (the hostile-driver simulation).

    python scripts/gate.py [sf_dir]        # default /root/testdata/sf0.01
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from ravelytics_spark.testing import compare, duckdb_connection

    con = duckdb_connection(sf_dir)
    qs, osql = mod.queries(), mod.oracle_sql()
    print(f"entry rows: {mod.entry(spark).count()}; {len(qs)} queries, {len(osql)} oracles")

    t0 = time.time()
    failures = []
    for name, fn in qs.items():
        try:
            if name in osql:
                problems = compare(fn(spark, sf_dir), con, osql[name], name)
                if problems:
                    failures.append(problems[0])
            else:
                assert fn(spark, sf_dir).count() >= 0
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    for f in failures:
        print("FAIL", f[:300])
    print(
        f"GATE: {len(qs) - len(failures)}/{len(qs)} ok "
        f"({len(osql)} oracle-checked) in {time.time() - t0:.0f}s"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
