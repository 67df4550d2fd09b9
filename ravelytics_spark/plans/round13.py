"""Round-13 catalog entries — novelty scoring, template mining,
compressed-domain ANN.

* **x60_ngram_novelty** — per-document fraction of distinct word
  5-grams that occur in NO other document (corpus document-frequency
  = 1). The memorization/novelty signal: near-zero novelty means the
  doc is assembled from corpus boilerplate; high novelty marks unique
  content worth keeping (and, inverted, the overlap signal
  decontamination screens use, x19).
* **x61_prefix_clusters** — template/boilerplate mining by identical
  leading-k-word prefix (the crawl-corpus "same page skeleton"
  detector — a dedup signal BETWEEN x1c's whole-doc canonical form
  and x24's per-line dedup). Reports each multi-doc prefix cluster
  with its members.
* **x62_pq_topk** (harness) — product-quantization ANN (FAISS-PQ
  structure): per-subspace codebooks, vectors encoded as n_sub small
  codes (32× compression at dim 64 / 8 subspaces), asymmetric-
  distance shortlist scanned in the compressed domain, exact re-rank
  on the shortlist only. Deterministic hash-picked codebooks, so the
  result is stable — but approximate by design, so certified by
  recall property tests + harness rows-check rather than an oracle.

Hash-parity conventions as plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# x60 — n-gram novelty (fraction of shingles unique to the doc)
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = """
WITH tok AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
    FROM documents WHERE length(trim(text)) > 0
),
sh AS (
    SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS g
    FROM tok, unnest(generate_series(1, len(ws) - 4)) AS u(i)
    WHERE len(ws) >= 5
),
dsh AS (SELECT DISTINCT doc_id, g FROM sh),
dfreq AS (SELECT g, count(*) AS df FROM dsh GROUP BY g)
SELECT dsh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(CAST(SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS novelty
FROM dsh JOIN dfreq USING (g)
GROUP BY dsh.doc_id
ORDER BY dsh.doc_id
"""


@q(
    "x60_ngram_novelty",
    "OP-X4-ext",
    "Per-document n-gram novelty: the fraction of a doc's DISTINCT "
    "word 5-grams whose corpus document-frequency is 1 — low novelty "
    "= assembled from boilerplate shared with other docs, high = "
    "unique content; the inverse view of the overlap signal "
    "decontamination uses. Shape: shingle explode → per-doc distinct "
    "(one hash-agg keyed (doc, shingle)) → shingle-DF agg → join "
    "back → per-doc ratio. At 100 TB the shingle column hashes to 8 "
    "bytes before the shuffle (the _hashed_shingles path; string "
    "shingles here only because the oracle must build identical "
    "strings).",
    _NOVELTY_ORACLE,
)
def x60_ngram_novelty(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim("text"), r"\s+")
    tok = d.filter(F.length(F.trim("text")) > 0).select("doc_id", ws.alias("ws"))
    sh = (
        tok.filter(F.size("ws") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 4), "
                    "i -> array_join(slice(ws, i, 5), ' '))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    dfreq = sh.groupBy("g").agg(F.count("*").alias("df"))
    return (
        sh.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("int")).cast("long").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles"), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x61 — template mining by leading-k-word prefix
# ---------------------------------------------------------------------------

_PREFIX_K = 8

_PREFIX_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
    FROM documents WHERE length(trim(text)) > 0
),
pfx AS (
    SELECT doc_id, array_to_string(ws[1:{_PREFIX_K}], ' ') AS prefix
    FROM tok WHERE len(ws) >= {_PREFIX_K}
)
SELECT prefix,
       CAST(count(*) AS BIGINT) AS n_docs,
       string_agg(doc_id, ',' ORDER BY doc_id) AS member_ids
FROM pfx GROUP BY prefix HAVING count(*) >= 2
ORDER BY prefix
"""


@q(
    "x61_prefix_clusters",
    "OP-X1-ext",
    f"Template/boilerplate mining: documents sharing their leading "
    f"{_PREFIX_K}-word prefix form a cluster (the crawl-corpus page-"
    "skeleton detector, sitting between whole-doc canonical dedup "
    "(x1c) and per-line dedup (x24)). One map-side prefix projection "
    "+ one hash-agg; the prefix hashes to 8 bytes at scale (string "
    "form here for oracle parity). Multi-doc clusters only.",
    _PREFIX_ORACLE,
)
def x61_prefix_clusters(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim("text"), r"\s+")
    pfx = (
        d.filter(F.length(F.trim("text")) > 0)
        .select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= _PREFIX_K)
        .select(
            "doc_id",
            F.array_join(F.slice("ws", 1, _PREFIX_K), " ").alias("prefix"),
        )
    )
    return (
        pfx.groupBy("prefix")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "member_ids"
            ),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("prefix")
    )


# ---------------------------------------------------------------------------
# x62 — product-quantization ANN (harness; approximate by design)
# ---------------------------------------------------------------------------


@q(
    "x62_pq_topk",
    "OP-X3-ext",
    "Product-quantization ANN (FAISS-PQ structure): deterministic "
    "per-subspace codebooks, vectors stored as 8 codes (32x "
    "compression), asymmetric-distance scan in the compressed domain, "
    "exact re-rank of the shortlist. Approximate by design → recall "
    "property tests + harness rows-check.",
    None,
)
def x62_pq_topk(spark, sf_dir):
    from ravelytics_spark.operators import similarity as SIM

    e = load_table(spark, sf_dir, "embeddings")
    probe = [r.embedding for r in e.filter(F.col("vec_id") == 0).collect()][0]
    return SIM.pq_topk(
        e, "embedding", [float(x) for x in probe], dim=64, k=10, rerank=50
    )
