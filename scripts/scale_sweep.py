"""Dedup-family scale sweep: 1x / 10x / 100x the sf0.1 documents corpus.

Materializes replicated corpora to parquet first (setup cost excluded),
then times the operators end-to-end with a noop sink. Replicas are
word-salted (every space becomes " r{i}x", prefixing each subsequent
word with the replica tag) so cross-replica documents share no
shingles: true near-dup pairs exist only WITHIN a replica, and the
correct output — like the input — scales linearly. An un-salted
replication would plant C(replicas, 2) near-dup pairs per document and
measure the quadratic output, not the algorithm.

    python scripts/scale_sweep.py [factors...]     # default 1 10 100
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ravelytics_spark.operators import dedup as DD  # noqa: E402
from ravelytics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/ravelytics_scale_sweep"


def build_corpus(spark, factor: int) -> str:
    path = f"{WORK}/docs_{factor}x.parquet"
    if os.path.exists(path):
        return path
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    reps = spark.range(factor).select(F.col("id").alias("__rep"))  # long
    out = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (
                F.col("doc_id").cast("long") + F.col("__rep") * F.lit(10_000_000).cast("long")
            ).alias("doc_id"),
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.concat(
                    F.lit("r"), F.col("__rep").cast("string"), F.lit("x "),
                    F.regexp_replace(
                        "text", " ", F.concat(F.lit(" r"), F.col("__rep").cast("string"), F.lit("x"))
                    ),
                )
            ).alias("text"),
        )
    )
    out.repartition(max(2, factor // 2)).write.mode("overwrite").parquet(path)
    return path


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="scale_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def t(label, df, n=2):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best or 9e9, time.perf_counter() - t0)
        print(f"    {label:26s} {best:8.2f}s", flush=True)
        return best

    for factor in factors:
        path = build_corpus(spark, factor)
        docs = spark.read.parquet(path)
        n = docs.count()
        print(f"-- {factor}x: {n} docs", flush=True)
        t("exact dedup (fingerprint)", DD.dedup_fingerprint(docs, "text", keep_by="doc_id"))
        t("minhash signatures", DD.minhash_signatures(docs, "doc_id", "text"))
        t("minhash+LSH full pairs", DD.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5))
        t("simhash signatures", DD.simhash_signatures(docs, "doc_id", "text"))

    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
