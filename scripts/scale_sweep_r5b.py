"""Round-5 scale sweep, batch 2: the round-21/22 operators at
1x / 10x / 100x.

Same methodology as scale_sweep_r5.py — scaled TABLE DIRECTORIES so
the sweep runs the exact catalog entries: replicas are key-disjoint
(doc/cust/order/part/user/vec keys offset per replica; documents
word-salted so replicas share no tokens), which makes the correct
output grow linearly with the input (per-key groups, baskets,
sessions, sources and rankings are replica-disjoint). Dimension-bound
outputs (brands^2 pairs, month series, contingency cells) stay
fixed-size while their input grows — the shape 100 TB wants. Setup
cost is excluded; timings are best-of-2 noop-sink writes.

    python scripts/scale_sweep_r5b.py [factors...]   # default 1 10 100
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/ravelytics_scale_sweep_r5b"

SWEEP = [
    # documents family
    "x109_dataset_split",
    "x110_source_pair_jaccard",
    "x115_gini_concentration",
    "x116_chi2_independence",
    "x117_bm25_scan",
    "x122_rrf_hybrid_search",
    # lineitem/part family
    "x108_cms_heavy_hitters",
    "x112_pareto_abc",
    "x113_basket_lift",
    # orders/customer family
    "x111_rfm_segmentation",
    "x114_trend_slope",
    "x119_ewma_revenue",
    "x124_tukey_outliers",
    "x125_cusum_changepoint",
    # events family
    "x126_session_profile",
]


def build_dir(spark, factor: int) -> str:
    out_dir = f"{WORK}/sf_{factor}x"
    done = f"{out_dir}/.done"
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rep = spark.range(factor).select(F.col("id").alias("__rep"))
    parts = max(2, factor // 2)

    def write(df, name, n_parts=None):
        df.repartition(n_parts or parts).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    write(
        docs.crossJoin(F.broadcast(rep)).select(
            (F.col("doc_id") + F.col("__rep") * F.lit(10_000_000)).alias("doc_id"),
            F.when(F.col("__rep") == 0, F.col("text"))
            .otherwise(
                F.concat(
                    F.lit("r"),
                    F.col("__rep").cast("string"),
                    F.lit("x "),
                    F.regexp_replace(
                        "text",
                        " ",
                        F.concat(
                            F.lit(" r"), F.col("__rep").cast("string"), F.lit("x")
                        ),
                    ),
                )
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        ),
        "documents",
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    write(
        orders.crossJoin(F.broadcast(rep))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * 100_000_000)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("__rep") * 10_000_000)
        .drop("__rep"),
        "orders",
    )

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    write(
        cust.crossJoin(F.broadcast(rep))
        .withColumn("c_custkey", F.col("c_custkey") + F.col("__rep") * 10_000_000)
        .drop("__rep"),
        "customer",
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write(
        li.crossJoin(F.broadcast(rep))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * 100_000_000)
        .withColumn("l_partkey", F.col("l_partkey") + F.col("__rep") * 10_000_000)
        .drop("__rep"),
        "lineitem",
        max(2, factor),
    )

    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    write(
        part.crossJoin(F.broadcast(rep))
        .withColumn("p_partkey", F.col("p_partkey") + F.col("__rep") * 10_000_000)
        .drop("__rep"),
        "part",
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    write(
        ev.crossJoin(F.broadcast(rep))
        .withColumn("user_id", F.col("user_id") + F.col("__rep") * 10_000_000)
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * 100_000_000)
        .drop("__rep"),
        "events",
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    write(
        emb.crossJoin(F.broadcast(rep))
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * 10_000_000)
        .drop("__rep"),
        "embeddings",
    )

    # small dims copied as-is (nation/region are fixed-size)
    for name in ("nation", "region"):
        src = f"{SF_DIR}/{name}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{out_dir}/{name}.parquet"
            )
    open(done, "w").close()
    return out_dir


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="scale_sweep_r5b")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ravelytics_spark.plans.queries import REGISTRY

    for factor in factors:
        d = build_dir(spark, factor)
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        print(f"-- {factor}x ({n} docs)", flush=True)
        for name in SWEEP:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                REGISTRY[name].spark(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best or 9e9, time.perf_counter() - t0)
            print(f"    {name:28s} {best:8.2f}s", flush=True)

    if os.environ.get("SWEEP_KEEP", "") != "1":
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
