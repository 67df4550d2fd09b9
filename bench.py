"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ravelytics_spark.plans.queries import REGISTRY
from ravelytics_spark.session import get_spark

# Headline set: one per operator family, weighted toward the
# shuffle/join/agg-heavy plans that dominate at scale.
# Ordered cheap-scan-first: the first parquet query still pays one-time
# file-listing/codegen costs the generic warmup can't cover; charging
# them to the plain scan keeps the complex-query timings honest.
HEADLINE = [
    "s11_scan_lineitem",
    "flagship_techno_stack",
    "g3_multikey_group",
    "j2_inner_join",
    "j1_left_join",
    "g1_argmax_latest",
    "w2_rank",
    "o1_topk",
    "t_window_daily",
    "a1_explode",
    "x4_word_count",
    "x1_dedup_exact",
    "x3_cosine_topk",
    "x2_minhash_lsh",
    "xj_asof_join",
    "x10_curation_full",
    "tpch_q3_shipping_priority",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="ravelytics_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen/file-listing paths so the first measured query
    # isn't charged ~10s of session startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        query = REGISTRY.get(name)
        if query is None:
            continue
        t0 = time.perf_counter()
        df = query.spark(spark, sf_dir)
        # noop sink executes the FULL physical plan (count() would let the
        # optimizer eliminate sorts and prune the plan we want to measure).
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
