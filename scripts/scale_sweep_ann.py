"""ANN / fuzzy-join / composed-curation scale sweep: 1x / 10x / 100x /
1000x replicas of the sf0.1 corpora (embeddings: 2k → 2M vectors;
customer names: 15k → 1.5M strings; documents: 5k → 500k docs).

Companion to ``scale_sweep.py`` (which covers the dedup family); this
one measures the remaining scale-path families:

- **ANN search**: brute-force cosine top-k with the native HOF kernel
  (the oracle baseline) vs the Arrow/numpy kernel (the 100 TB scoring
  path), SRP-bucketed approximate top-k, and IVF two-stage search —
  the cost crossover between "scan everything" and "prune then scan"
  is the measurement.
- **Fuzzy self-join** (FastSS deletion neighborhoods): candidate rows
  grow ~linearly (σ·(L+1) variants per string), so wall time should
  track input size, not pairs².
- **Composed curation** (clean → exact dedup → MinHash+LSH → quality/
  lang/tokens): the end-to-end pipeline a training-data refresh runs.

Replica construction keeps outputs LINEAR in the input so the numbers
measure the algorithm, not planted quadratic blow-ups:

- embeddings: each replica adds deterministic per-(replica, id, dim)
  jitter (xxhash64-derived, ±0.05) — replicas of the same base vector
  stay far enough apart in cosine that top-k result sizes stay k, and
  near-dup structure is not amplified across replicas.
- customer names: each replica prefixes an 8-hex-char tag derived from
  md5(replica) — two tags collide in ≤1 edit with probability ~16⁻⁷,
  so edit-distance-≤1 pairs exist only WITHIN a replica.
- documents: word-salted per replica exactly as scale_sweep.py.

    python scripts/scale_sweep_ann.py [factors...]   # default 1 10 100

Env knobs: ``SWEEP_FAMILIES=ann,fuzzy,curation`` selects families;
``SWEEP_KEEP=1`` keeps the /tmp corpora for re-runs. The full sweep,
including the factor-1000 fuzzy join (15M names → ~450M variant rows),
runs at the default 8g local JVM since the round-4 groupBy rewrite of
the FastSS candidate stage (the old self-join form GC-thrashed at 8g
and needed SPARK_DRIVER_MEMORY=64g).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from ravelytics_spark.operators import similarity as SIM  # noqa: E402
from ravelytics_spark.operators.fuzzy import fuzzy_self_pairs  # noqa: E402
from ravelytics_spark.plans.curation import curate_full  # noqa: E402
from ravelytics_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/ravelytics_scale_sweep_ann"
DIM = 64


def build_embeddings(spark, factor: int) -> str:
    path = f"{WORK}/emb_{factor}x.parquet"
    if os.path.exists(path):
        return path
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    reps = spark.range(factor).select(F.col("id").alias("__rep"))
    jittered = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("__rep") * F.lit(10_000_000)).alias("vec_id"),
            F.when(F.col("__rep") == 0, F.col("embedding"))
            .otherwise(
                # deterministic ±0.05 jitter per (replica, vec, dim)
                F.transform(
                    F.col("embedding"),
                    lambda v, i: (
                        v
                        + (
                            F.pmod(
                                F.xxhash64(F.col("__rep"), F.col("vec_id"), i), F.lit(1000)
                            ).cast("float")
                            / F.lit(10000.0)
                            - F.lit(0.05)
                        ).cast("float")
                    ),
                )
            )
            .alias("embedding"),
            F.col("label"),
        )
    )
    jittered.repartition(max(2, factor // 4)).write.mode("overwrite").parquet(path)
    return path


def build_names(spark, factor: int) -> str:
    path = f"{WORK}/names_{factor}x.parquet"
    if os.path.exists(path):
        return path
    base = spark.read.parquet(f"{SF_DIR}/customer.parquet").select("c_custkey", "c_name")
    reps = spark.range(factor).select(F.col("id").alias("__rep"))
    out = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("c_custkey") + F.col("__rep") * F.lit(100_000_000)).alias("c_custkey"),
            F.when(F.col("__rep") == 0, F.col("c_name"))
            .otherwise(
                F.concat(
                    F.substring(F.md5(F.col("__rep").cast("string")), 1, 8),
                    F.lit(" "),
                    F.col("c_name"),
                )
            )
            .alias("c_name"),
        )
    )
    out.repartition(max(2, factor // 4)).write.mode("overwrite").parquet(path)
    return path


def build_docs(spark, factor: int) -> str:
    import scale_sweep  # same word-salting as the dedup-family sweep

    scale_sweep.SF_DIR = SF_DIR
    scale_sweep.WORK = WORK
    return scale_sweep.build_corpus(spark, factor)


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="scale_sweep_ann")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    query_vec = [
        r.embedding
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .collect()
    ][0]

    def t(label, df, n=2):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best or 9e9, time.perf_counter() - t0)
        print(f"    {label:34s} {best:8.2f}s", flush=True)
        return best

    families = set(
        os.environ.get("SWEEP_FAMILIES", "ann,fuzzy,curation").split(",")
    )

    for factor in factors:
        # Scale shuffle partitions with the data, as a real cluster
        # would: the 1000x fuzzy sweep pushes ~450M variant rows
        # through one groupBy — at the session default of 32
        # partitions that is ~14M rows of per-task aggregation state,
        # which GC-thrashes an 8g heap nondeterministically (observed
        # both green at 569s and heap-OOM on identical code). More
        # partitions = less per-task state; AQE coalesces the small
        # factors' excess back down.
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(min(1024, 32 * factor))
        )
        if "ann" in families:
            emb = spark.read.parquet(build_embeddings(spark, factor))
            n_vec = emb.count()
            print(f"-- ANN {factor}x: {n_vec} vectors", flush=True)
            t("cosine top-k (native HOF)", SIM.cosine_topk(emb, "embedding", query_vec, k=10))
            t("cosine top-k (arrow kernel)", SIM.cosine_topk(emb, "embedding", query_vec, k=10, impl="arrow"))
            t("srp top-k (build+probe)", SIM.srp_topk(emb, "embedding", query_vec, dim=DIM, k=10))
            t("ivf top-k (build+probe)", SIM.ivf_topk(emb, "embedding", query_vec, k=10))

            # build/serve split: materialize the index once (build cost
            # reported separately), then probe against the prebuilt index
            # — the steady-state serving shape of any ANN deployment.
            t0 = time.perf_counter()
            sig_path = f"{WORK}/srp_{factor}x.parquet"
            SIM.srp_signatures(emb, "embedding", DIM, 8).write.mode("overwrite").parquet(sig_path)
            cent_path = f"{WORK}/ivfc_{factor}x.parquet"
            asg_path = f"{WORK}/ivfa_{factor}x.parquet"
            # Lloyd-refine the hash seeds on a training sample (the
            # FAISS practice); the refined centroids are the index.
            cents = SIM.ivf_refine_centroids(
                emb, "embedding", n_cells=16, n_iters=2,
                train_fraction=min(1.0, 200_000 / max(n_vec, 1)),
            )
            cents.write.mode("overwrite").parquet(cent_path)
            SIM.ivf_assign(emb, spark.read.parquet(cent_path), "embedding").write.mode(
                "overwrite"
            ).parquet(asg_path)
            print(f"    {'index build (srp sigs + ivf)':34s} {time.perf_counter() - t0:8.2f}s", flush=True)
            sigs = spark.read.parquet(sig_path)
            t("srp probe (prebuilt sigs)", SIM.srp_topk(emb, "embedding", query_vec, dim=DIM, k=10, signatures=sigs))
            t(
                "ivf probe (prebuilt index)",
                SIM.ivf_topk(
                    emb, "embedding", query_vec, k=10,
                    centroids=spark.read.parquet(cent_path),
                    assigned=spark.read.parquet(asg_path),
                ),
            )

            # PQ build/serve: trained codebooks + encoded codes once;
            # an ADC probe then touches only the codes column.
            t0 = time.perf_counter()
            book_path = f"{WORK}/pqb_{factor}x.parquet"
            code_path = f"{WORK}/pqc_{factor}x.parquet"
            books = SIM.pq_refine_codebooks(
                emb, "embedding", DIM, n_sub=8, n_iters=2,
                train_fraction=min(1.0, 200_000 / max(n_vec, 1)),
            )
            books.write.mode("overwrite").parquet(book_path)
            SIM.pq_encode(
                emb, spark.read.parquet(book_path), "embedding", DIM, n_sub=8
            ).write.mode("overwrite").parquet(code_path)
            print(f"    {'index build (pq books + codes)':34s} {time.perf_counter() - t0:8.2f}s", flush=True)
            t(
                "pq probe (prebuilt index)",
                SIM.pq_topk(
                    emb, "embedding", query_vec, dim=DIM, k=10, n_sub=8,
                    codebooks=spark.read.parquet(book_path),
                    encoded=spark.read.parquet(code_path),
                ),
            )

        if "fuzzy" in families:
            names = spark.read.parquet(build_names(spark, factor))
            n_nm = names.count()
            print(f"-- fuzzy {factor}x: {n_nm} names", flush=True)
            t("fuzzy self-pairs (FastSS)", fuzzy_self_pairs(names, "c_custkey", "c_name"))

        if "curation" in families:
            docs = spark.read.parquet(build_docs(spark, factor))
            n_doc = docs.count()
            print(f"-- curation {factor}x: {n_doc} docs", flush=True)
            t("curate_full (composed)", curate_full(docs), n=1 if factor >= 100 else 2)

    if not os.environ.get("SWEEP_KEEP"):
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
