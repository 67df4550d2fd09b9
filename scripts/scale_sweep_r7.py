"""Round-6b scale sweep: the round-25 staged operators at 1x/10x/100x.

Reuses scale_sweep_r6's scaled-directory builder (key-offset replicas,
replica-disjoint truth) and adds an events replica (user_id/event_id
offset per replica — journeys stay replica-local, so x174's
attribution workload scales with disjoint users, the honest shape).

    python scripts/scale_sweep_r7.py [factors...]    # default 1 10 100
    SWEEP_ONLY=a,b,c to restrict entries
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ravelytics_spark.session import get_spark  # noqa: E402
from scripts.scale_sweep_r6 import SF_DIR, build_dir  # noqa: E402

WORK = "/tmp/ravelytics_scale_sweep_r6"  # shared with r6 (same replicas)

ENTRIES = [
    "x168_mann_whitney",
    "x169_spearman_monthly",
    "x170_kendall_tau",
    "x171_acf_lags",
    "x172_bfs_hops",
    "x173_weighted_median",
    "x174_u_attribution",
    "x175_cluster_quality",
    "x176_seq_brand_adoption",
    "x177_ann_recall_eval",
    "x178_stump_split",
    "x179_neardup_threshold_curve",
    "x180_event_burstiness",
    "x181_fk_integrity",
    "x182_power_sample_size",
    "x183_join_key_skew",
    "x184_dup_cluster_sizes",
    "x185_xyz_classes",
    "x186_growth_accounting",
    "x187_session_paths",
    "x188_embedding_audit",
    "x189_seasonal_decomp",
    "x190_rolling_market_corr",
    "x191_apriori_triples",
    "x192_compression_quality",
    "x193_vocab_growth",
]


def add_events(spark, factor: int) -> str:
    out_dir = f"{WORK}/sf_{factor}x"
    done = f"{out_dir}/.events_done"
    if os.path.exists(done):
        return out_dir
    from ravelytics_spark.sources.tables import load_table

    rep = spark.range(factor).select(F.col("id").alias("__rep"))
    # load_table converts the TIMESTAMP(NANOS) ts column; the replica
    # is written back as standard micros, which load_table passes through
    ev = load_table(spark, SF_DIR, "events")
    (
        ev.crossJoin(F.broadcast(rep))
        .withColumn(
            "event_id", F.col("event_id") + F.col("__rep") * 100_000_000
        )
        .withColumn("user_id", F.col("user_id") + F.col("__rep") * 10_000_000)
        .drop("__rep")
        .repartition(max(2, factor // 2))
        .write.mode("overwrite")
        .parquet(f"{out_dir}/events.parquet")
    )
    open(done, "w").close()
    return out_dir


def add_supplier(spark, factor: int) -> None:
    out_dir = f"{WORK}/sf_{factor}x"
    done = f"{out_dir}/.supplier_done"
    if os.path.exists(done):
        return
    rep = spark.range(factor).select(F.col("id").alias("__rep"))
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    (
        sup.crossJoin(F.broadcast(rep))
        .withColumn(
            "s_suppkey", F.col("s_suppkey") + F.col("__rep") * 10_000_000
        )
        .drop("__rep")
        .repartition(max(2, factor // 2))
        .write.mode("overwrite")
        .parquet(f"{out_dir}/supplier.parquet")
    )
    open(done, "w").close()


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="scale_sweep_r7")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ravelytics_spark.plans.round25_staged import STAGED

    only = {n for n in os.environ.get("SWEEP_ONLY", "").split(",") if n}
    for factor in factors:
        d = build_dir(spark, factor)
        add_events(spark, factor)
        add_supplier(spark, factor)
        print(f"-- {factor}x", flush=True)
        for name in ENTRIES:
            if only and name not in only:
                continue
            if name == "x179_neardup_threshold_curve" and factor >= 100:
                # No silent caps: replicas copy embedding VECTORS
                # verbatim (only vec_id offsets), so every vector
                # gains C(factor,2) TRUE duplicate pairs — the answer
                # itself is quadratic in the replica factor (~25M true
                # pairs at 100x) and the fixed 256-code SRP space
                # densifies the candidate join the same way. 10x
                # (45x true pairs) ran 57s, output-bound like x165.
                print(
                    f"    {name:28s}  SKIPPED at {factor}x "
                    "(output-bound: verbatim-replica vectors make true "
                    "pairs quadratic in the factor; see SCALING.md)",
                    flush=True,
                )
                continue
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                STAGED[name].spark(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best or 9e9, time.perf_counter() - t0)
            print(f"    {name:28s} {best:8.2f}s", flush=True)

    if os.environ.get("SWEEP_KEEP", "") != "1":
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
