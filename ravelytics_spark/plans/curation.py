"""End-to-end training-data curation pipeline over a document corpus —
the composed form of the OP-X operators (BASELINE.json north star):

    clean → exact dedup (first-ingested wins) → near-dedup
    (MinHash+LSH, keep the lowest doc_id of each dup cluster) →
    quality scoring + filter → language ID → token accounting

Everything before the near-dedup step is deterministic SQL semantics
(oracle-checked as ``x10_curation_deterministic``); the full pipeline
including LSH runs as a harness entry (``x10_curation_full``).

Scale notes: the stages compose into ~4 shuffles total (exact-dedup
group, signature group, LSH bucket join, and nothing else — quality/
lang/token columns are map-side). Near-dup "keep lowest id" uses a
connected-components-free approximation (drop any doc that pairs with a
lower id), which is exactly right for dedup since pair similarity is
transitive enough at high thresholds and dropping strictly-higher ids
can never empty a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ravelytics_spark.functions import text as TX
from ravelytics_spark.operators.dedup import dedup_exact, minhash_dedup_pairs


def clean_documents(docs: DataFrame) -> DataFrame:
    """Normalize whitespace, drop empty docs."""
    return docs.withColumn(
        "text", F.trim(F.regexp_replace("text", r"\s+", " "))
    ).filter(F.length("text") > 0)


def annotate(docs: DataFrame) -> DataFrame:
    """Map-side curation columns: quality, language, token counts.

    Tokenizes ONCE behind a projection boundary and feeds the *_toks
    scoring forms — the tokenizer is an interpreted HOF, so computing it
    per-feature (4×) dominated this stage's profile.
    """
    toked = docs.select("*", TX.tokenize_ws("text").alias("__toks"))
    return toked.select(
        "*",
        TX.quality_score_toks(F.col("__toks")).alias("quality"),
        TX.lang_id_toks(F.col("__toks")).alias("lang_pred"),
        F.size("__toks").cast("long").alias("n_tokens"),
        TX.fingerprint_md5("text").alias("fp"),
    ).drop("__toks")


def curate_deterministic(docs: DataFrame, min_quality: float = 0.25) -> DataFrame:
    """The oracle-checkable prefix: clean → exact dedup → annotate →
    quality filter."""
    cleaned = clean_documents(docs)
    deduped = dedup_exact(cleaned, ["text"], keep_by="doc_id")
    return annotate(deduped).filter(F.col("quality") >= min_quality)


def curate_full(
    docs: DataFrame,
    min_quality: float = 0.25,
    near_dup_threshold: float = 0.7,
) -> DataFrame:
    """Full pipeline with MinHash+LSH near-dedup between exact dedup and
    annotation. Keeps the lowest doc_id of every near-dup pair."""
    cleaned = clean_documents(docs)
    deduped = dedup_exact(cleaned, ["text"], keep_by="doc_id")
    pairs = minhash_dedup_pairs(
        deduped, "doc_id", "text", threshold=near_dup_threshold
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = deduped.join(losers, "doc_id", "left_anti")
    return annotate(survivors).filter(F.col("quality") >= min_quality)
