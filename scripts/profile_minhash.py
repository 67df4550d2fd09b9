"""Stage-level profile of the MinHash+LSH pipeline at a given sf.

Times each composed prefix with a noop sink (full plan execution):
  shingles  — tokenize + shingle-window + per-doc dedup
  sigs      — + 64-min signature aggregation
  cand      — + LSH banding self-join
  full      — + exact-Jaccard verification (minhash_dedup_pairs)

Also times an alternative signature aggregation using the
Kirsch–Mitzenmacher two-hash family h_i(x) = (h1 + i*h2) mod p
(2 xxhash64 calls per shingle instead of 64) to see whether hashing
is a material fraction of the signature stage.

    python scripts/profile_minhash.py [sf_dir] [n_samples]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ravelytics_spark.operators import dedup as DD  # noqa: E402
from ravelytics_spark.session import get_spark  # noqa: E402

PRIME = 2038074743  # < 2^31: i*h2p stays far below long overflow


def km_signatures(hashed, num_hashes=64):
    h1 = F.pmod(F.xxhash64(F.col("__shash")), F.lit(PRIME))
    h2 = F.pmod(F.xxhash64(F.lit(1), F.col("__shash")), F.lit(PRIME - 1)) + F.lit(1)
    mins = [
        F.min(F.pmod(h1 + F.lit(i) * h2, F.lit(PRIME))).alias(f"__m{i}")
        for i in range(num_hashes)
    ]
    return (
        hashed.groupBy("__id")
        .agg(*mins)
        .select(
            "__id",
            F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias("__sig"),
        )
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="minhash_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def t(label, df):
        best = None
        for _ in range(n_samples):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label:28s} {best:7.3f}s")
        return best

    sh = (
        DD._hashed_shingles(docs, "doc_id", "text", 5)
        .groupBy("__id", "__shash")
        .agg(F.lit(1).alias("__one"))
        .drop("__one")
        .repartition("__id")
    )
    t("shingles(dedup)", sh)

    sigs = DD.minhash_signatures(docs, "doc_id", "text")
    t("sigs(xxhash64 x64)", sigs)

    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("__shash"))).alias(f"__m{i}")
        for i in range(64)
    ]
    sigs_sh = sh.groupBy("__id").agg(*mins).select(
        "__id", F.array(*[F.col(f"__m{i}") for i in range(64)]).alias("__sig")
    )
    t("sigs-over-deduped(xx64)", sigs_sh)
    t("sigs-over-deduped(KM)", km_signatures(sh))

    cand = DD.minhash_lsh_candidates(sigs, 16, 4, 500)
    t("candidates(banded join)", cand)

    full = DD.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5)
    t("full pipeline", full)


if __name__ == "__main__":
    main()
