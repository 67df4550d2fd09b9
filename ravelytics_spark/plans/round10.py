"""Round-10 catalog entries — fuzzy joins, batched ANN, char-level
quality, schedule manifests.

* **x47_fuzzy_pairs** — edit-distance-≤1 self-join WITHOUT the N²
  cross product: deletion-neighborhood candidates (FastSS) verified by
  exact ``levenshtein``. The oracle IS the N² form (fine at sf0.01),
  so the hash-match proves the neighborhood join loses no pairs.
* **x48_ann_batch** — top-k nearest neighbors for a SET of query
  vectors in one corpus pass: broadcast the queries, score map-only,
  then two-phase top-k (per-partition pre-prune via
  ``spark_partition_id`` → global rank). Shuffles k·partitions·Q rows
  instead of N·Q — the batch-serving shape of OP-X3.
* **x49_char_entropy** — character-level Shannon entropy per document
  (gibberish/boilerplate quality signal; low-entropy = repeated
  chars/padding, high = random noise). Per-(doc,char) terms are
  rounded then decimal-summed, so the sum is addition-order-free and
  hash-stable across engines.
* **xs1_backfill_manifest** — schedule-interval manifest: every
  ``@daily`` interval over the orders date span with that day's row
  count (0 for gap days) — the backfill/catchup work list of
  ``ravelytics_spark.schedule`` derived relationally (ref
  spotify_ingest.py:148-158 ``@daily`` cadence; catchup semantics in
  schedule.due_runs, unit-tested).

Hash-parity conventions as plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ravelytics_spark.operators.fuzzy import fuzzy_self_pairs
from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# x47 — edit-distance-≤1 fuzzy self-join (FastSS deletion neighborhoods)
# ---------------------------------------------------------------------------

_FUZZY_ORACLE = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY id_a, id_b
"""


@q(
    "x47_fuzzy_pairs",
    "OP-X2-ext",
    "Edit-distance-<=1 fuzzy self-join via deletion neighborhoods "
    "(FastSS): each string emits length+1 single-deletion variants, "
    "candidates come from an equi-join on xxhash64(variant) (8-byte "
    "shuffle keys), and exact levenshtein verifies — sigma(L+1) rows "
    "through one shuffle instead of N^2/2 comparisons. The oracle is "
    "the quadratic form, so the hash-match certifies the neighborhood "
    "join finds exactly the same pairs.",
    _FUZZY_ORACLE,
)
def x47_fuzzy_pairs(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return (
        fuzzy_self_pairs(c, "c_custkey", "c_name")
        # Hash-repartition BEFORE the global sort: range partitioning
        # samples its child with a separate job, and without a shuffle
        # boundary here that sample pass re-executes the whole
        # candidates→levenshtein pipeline (r12 stage trace: two ~4.6 s
        # stages doing identical work). One cheap exchange of the
        # verified pairs makes the sample job a shuffle re-read.
        .repartition(F.col("id_a"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# x48 — batched ANN: top-k per query vector, one corpus pass
# ---------------------------------------------------------------------------

_N_QUERIES = 5
_ANN_K = 10

_ANN_ORACLE = f"""
WITH qs AS (
    SELECT vec_id AS query_id, embedding AS qv
    FROM embeddings WHERE vec_id < {_N_QUERIES}
),
scored AS (
    SELECT qs.query_id, e.vec_id,
        round(
            list_sum(list_transform(list_zip(e.embedding, qs.qv),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(qs.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
        4) AS cos_sim
    FROM embeddings e CROSS JOIN qs
),
ranked AS (
    SELECT query_id, vec_id, cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rnk
    FROM scored
)
SELECT query_id, vec_id, cos_sim, rnk
FROM ranked WHERE rnk <= {_ANN_K}
ORDER BY query_id, rnk
"""


@q(
    "x48_ann_batch",
    "OP-X3-ext",
    "Batched exact ANN serving: top-k per query for a SET of query "
    "vectors in ONE corpus pass — broadcast the Q queries, score "
    "map-only (native codegen cosine), then two-phase top-k: an "
    "Arrow-batched mapInPandas keeps the k best rows per query WITHIN "
    "each scan batch (no shuffle — a window keyed on "
    "spark_partition_id would itself shuffle all NxQ rows, which is "
    "why the local prune is a map operator), so only ~k x batches x Q "
    "rows reach the per-query global rank. The local prune's output "
    "depends on batch layout but is always a superset of the global "
    "top-k, so the final result is layout-independent (hash-certified "
    "against the flat oracle).",
    _ANN_ORACLE,
)
def x48_ann_batch(spark, sf_dir):
    from ravelytics_spark.functions.vectors import cosine

    e = load_table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = e.crossJoin(F.broadcast(qs)).select(
        "query_id",
        "vec_id",
        F.round(cosine("embedding", F.col("qv")), 4).alias("cos_sim"),
    )

    def local_topk(batches):
        for pdf in batches:
            yield (
                pdf.sort_values(
                    ["cos_sim", "vec_id"], ascending=[False, True]
                )
                .groupby("query_id", sort=False)
                .head(_ANN_K)
            )

    pruned = scored.mapInPandas(local_topk, scored.schema)
    final = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        pruned.withColumn("rnk", F.row_number().over(final).cast("long"))
        .filter(F.col("rnk") <= _ANN_K)
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# x49 — per-document character entropy (quality signal)
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH ch AS (
    SELECT doc_id, unnest(string_split(text, '')) AS c
    FROM documents
),
ch2 AS (SELECT doc_id, c FROM ch WHERE c <> ''),
freq AS (
    SELECT doc_id, c, count(*) AS n,
           SUM(count(*)) OVER (PARTITION BY doc_id) AS tot
    FROM ch2 GROUP BY doc_id, c
),
terms AS (
    SELECT doc_id, tot,
           round((CAST(n AS DOUBLE) / tot) * ln(CAST(n AS DOUBLE) / tot), 8) AS term
    FROM freq
)
SELECT doc_id, CAST(MAX(tot) AS BIGINT) AS n_chars,
       CAST(-SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE) AS entropy_nats
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


@q(
    "x49_char_entropy",
    "OP-X4-ext",
    "Character-level Shannon entropy per document (nats) — the cheap "
    "gibberish/boilerplate detector: near-zero for padded/repeated "
    "content, high for random noise; natural text sits in a stable "
    "band. One explode + per-(doc,char) hash-agg (map-side combined; "
    "alphabet per doc is tiny so the agg output is ~|alphabet| rows "
    "per doc). Each p*ln(p) term is rounded to 8 dp then summed as "
    "exact DECIMAL, so the total is independent of addition order — "
    "the float-determinism trick that makes ln() hash-checkable.",
    _ENTROPY_ORACLE,
)
def x49_char_entropy(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    ch = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("c")
    ).filter(F.col("c") != "")
    freq = ch.groupBy("doc_id", "c").agg(F.count("*").alias("n"))
    tot_w = Window.partitionBy("doc_id")
    terms = freq.select(
        "doc_id",
        F.sum("n").over(tot_w).alias("tot"),
        F.col("n").cast("double").alias("nd"),
    ).select(
        "doc_id",
        "tot",
        F.round(
            (F.col("nd") / F.col("tot")) * F.log(F.col("nd") / F.col("tot")), 8
        ).alias("term"),
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.max("tot").cast("long").alias("n_chars"),
            (-F.sum(F.col("term").cast("decimal(28,12)"))).cast("double").alias(
                "entropy_nats"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# xs1 — @daily schedule-interval manifest over the orders date span
# ---------------------------------------------------------------------------

_MANIFEST_ORACLE = """
WITH bounds AS (
    SELECT CAST(min(o_orderdate) AS DATE) AS d0,
           CAST(max(o_orderdate) AS DATE) AS d1
    FROM orders
),
days AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS run_date
    FROM bounds
),
per_day AS (
    SELECT CAST(o_orderdate AS DATE) AS run_date, count(*) AS n
    FROM orders GROUP BY 1
)
SELECT days.run_date, CAST(COALESCE(per_day.n, 0) AS BIGINT) AS n_orders
FROM days LEFT JOIN per_day USING (run_date)
ORDER BY run_date
"""


@q(
    "xs1_backfill_manifest",
    "OP-T4-ext",
    "@daily schedule-interval manifest: one row per daily interval "
    "across the orders date span with that interval's row count — 0 "
    "for gap days, which is exactly what a catchup backfill must know "
    "(ravelytics_spark.schedule implements the due/catchup/ledger "
    "semantics; this is the relational work-list form; ref "
    "spotify_ingest.py:148-158). Plan: one min/max agg (map-side "
    "combined to a single row), sequence+explode to the day spine, "
    "left join per-day counts (a second map-side-combined agg) — the "
    "spine and count sides are both tiny after aggregation, so the "
    "join broadcasts regardless of fact-table size.",
    _MANIFEST_ORACLE,
)
def xs1_backfill_manifest(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    days = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("run_date")
    )
    per_day = o.groupBy(
        F.col("o_orderdate").cast("date").alias("run_date")
    ).agg(F.count("*").alias("n"))
    return (
        days.join(F.broadcast(per_day), "run_date", "left")
        .select(
            "run_date",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
        )
        .orderBy("run_date")
    )
