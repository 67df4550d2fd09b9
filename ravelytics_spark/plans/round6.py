"""Round-6 catalog entries — corpus-global curation.

* **x24b_corpus_line_dedup** — C4's ACTUAL line-dedup rule is corpus-
  global (any ≥3-sentence span occurring more than once in the corpus
  keeps ONE occurrence); x24_line_dedup is the within-doc form. Here
  every synthesized 6-token line keeps only its corpus-wide first
  occurrence (min (doc_id, line_index) — deterministic keeper), and
  each document is reassembled from its surviving lines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table

_LINE_W = 6

_CORPUS_LINE_ORACLE = f"""
WITH base AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           CAST(ceil(len(string_split(text, ' ')) / {_LINE_W}.0) AS BIGINT)
               AS nl
    FROM documents
),
lines AS (
    SELECT doc_id, u.i,
           CASE WHEN u.i < nl
                THEN array_to_string(
                    toks[(CAST(u.i AS INT) * {_LINE_W} + 1):
                         (CAST(u.i AS INT) * {_LINE_W} + {_LINE_W})], ' ')
                ELSE array_to_string(toks[1:{_LINE_W}], ' ')
           END AS line
    FROM base, UNNEST(range(0, nl + 1)) AS u(i)
),
keepers AS (
    SELECT line, min(struct_pack(d := doc_id, i := i)) AS k
    FROM lines GROUP BY line
),
kept AS (
    SELECT l.doc_id, l.i, l.line
    FROM lines l JOIN keepers ON l.line = keepers.line
    WHERE l.doc_id = keepers.k.d AND l.i = keepers.k.i
),
rebuilt AS (
    SELECT doc_id,
           string_agg(line, chr(10) ORDER BY i) AS text_deduped,
           CAST(count(*) AS BIGINT) AS n_lines_kept
    FROM kept GROUP BY doc_id
),
totals AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM lines
    GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(r.text_deduped, '') AS text_deduped,
       t.n_lines - coalesce(r.n_lines_kept, 0) AS n_removed
FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
ORDER BY t.doc_id
"""


@q(
    "x24b_corpus_line_dedup",
    "OP-X2-ext",
    "CORPUS-GLOBAL C4 line dedup (x24 is the within-doc form): every "
    f"synthesized {_LINE_W}-token line keeps exactly its corpus-wide "
    "first occurrence — keeper = min(struct(doc_id, line_index)), an "
    "order-free algebraic agg, so the result is identical on any "
    "partitioning — and docs are rebuilt from surviving lines "
    "(array_sort(collect_list(struct)) + native struct-extract, no "
    "HOF). Docs stripped of every line survive with empty text. At "
    "100 TB: one line hash-agg + one line-keyed join + one doc-keyed "
    "rebuild agg; shuffle keys would be xxhash64 digests of lines in "
    "the scale deployment (strings here for oracle parity).",
    _CORPUS_LINE_ORACLE,
)
def x24b_corpus_line_dedup(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("__toks")).withColumn(
        "__nl", F.ceil(F.size("__toks") / F.lit(float(_LINE_W))).cast("long")
    )
    lines = base.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("__nl"))
        ).alias("i"),
        "__toks",
        "__nl",
    ).select(
        "doc_id",
        "i",
        F.when(
            F.col("i") < F.col("__nl"),
            F.array_join(
                F.slice(
                    "__toks", (F.col("i") * _LINE_W + 1).cast("int"), _LINE_W
                ),
                " ",
            ),
        )
        .otherwise(F.array_join(F.slice("__toks", 1, _LINE_W), " "))
        .alias("line"),
    )
    # The heavy agg + join run on 16-byte md5 digests, not line strings
    # (the oracle groups raw strings; per-doc results are identical).
    lines = lines.withColumn("__lk", F.md5("line"))
    keepers = lines.groupBy("__lk").agg(
        F.min(F.struct(F.col("doc_id").alias("d"), F.col("i").alias("ki"))).alias(
            "k"
        )
    )
    kept = (
        lines.join(keepers, "__lk")
        .filter(
            (F.col("doc_id") == F.col("k.d")) & (F.col("i") == F.col("k.ki"))
        )
        .select("doc_id", "i", "line")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct(F.col("i"), F.col("line")))
            ).getField("line"),
            "\n",
        ).alias("text_deduped"),
        F.count("*").cast("long").alias("n_lines_kept"),
    )
    totals = lines.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines")
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            (
                F.col("n_lines") - F.coalesce("n_lines_kept", F.lit(0))
            ).cast("long").alias("n_removed"),
        )
        .orderBy("doc_id")
    )
