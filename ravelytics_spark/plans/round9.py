"""Round-9 catalog entries — corpus mixture, weighted sampling,
collocation mining.

* **x44_temperature_mix** — temperature-scaled source mixture (the
  mT5/UniMax multilingual recipe): sampling probability per source
  p_s ∝ tokens_s^α with α=0.3, plus the implied up/down-sampling boost
  vs the natural token share. THE knob a 100 TB pre-training mix is
  tuned with.
* **x45_weighted_sample** — weighted sampling WITHOUT replacement
  (Efraimidis–Spirakis A-ES): per-doc key ln(u)/w with u a
  deterministic Knuth-hash uniform and w the doc weight; the k largest
  keys are exactly a weight-proportional sample without replacement.
  One map-side key computation + TakeOrderedAndProject — no global
  sort, no rejection loop, reproducible under any partitioning.
* **x46_pmi_collocations** — pointwise mutual information over
  adjacent word pairs (collocation extraction for tokenizer/vocab
  construction): PMI = ln(p(ab) / (p(a)·p(b))) with a min-count
  support filter. Bigrams via the arrays_zip tail-zip (codegen, no
  per-doc window shuffle, same idiom as x16), unigram/bigram LMs
  broadcast back.

Hash-parity conventions as plans/queries.py; ln()/pow() run on
bit-identical IEEE inputs in both engines (x20 precedent) with final
rounding where accumulation order could differ.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# x44 — temperature-scaled source mixture (α = 0.3)
# ---------------------------------------------------------------------------

_MIX_ALPHA = 0.3

_MIX_ORACLE = f"""
WITH tok AS (
    SELECT source, doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+'))
           END AS n_tok
    FROM documents
),
per_src AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM tok GROUP BY source
),
w AS (
    SELECT *, pow(CAST(n_tokens AS DOUBLE), {_MIX_ALPHA}) AS ws
    FROM per_src
),
tot AS (
    SELECT CAST(SUM(CAST(ws AS DECIMAL(28,12))) AS DOUBLE) AS denom,
           CAST(SUM(n_tokens) AS DOUBLE) AS T
    FROM w
)
SELECT source, n_docs, n_tokens,
       round(ws / denom, 6) AS p_mix,
       round((ws / denom) / (CAST(n_tokens AS DOUBLE) / T), 6) AS boost
FROM w CROSS JOIN tot
ORDER BY source
"""


@q(
    "x44_temperature_mix",
    "OP-X4-ext",
    f"Temperature-scaled source mixture (α={_MIX_ALPHA}, the "
    "mT5/UniMax multilingual recipe): per-source sampling probability "
    "p_s ∝ tokens_s^α, flattening the natural token distribution so "
    "low-resource sources are up-sampled (boost > 1) and dominant "
    "ones down-sampled. One token-count agg per doc folded into a "
    "per-source agg (map-side combined), a 20-row weight table whose "
    "denominator is a decimal-exact sum (addition order free), and "
    "pure IEEE pow/div — both engines execute identical float ops. "
    "At 100 TB the per-source table is trivially broadcast; the "
    "token counting is the only corpus-scale pass.",
    _MIX_ORACLE,
)
def x44_temperature_mix(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # native token count (no interpreted HOF in the corpus-scale pass)
    n_tok = F.when(F.length(F.trim("text")) == 0, 0).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    per_src = (
        d.select("source", n_tok.alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
    w = per_src.withColumn(
        "ws", F.pow(F.col("n_tokens").cast("double"), F.lit(_MIX_ALPHA))
    )
    tot = w.agg(
        F.sum(F.col("ws").cast("decimal(28,12)")).cast("double").alias("denom"),
        F.sum("n_tokens").cast("double").alias("T"),
    )
    return (
        w.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("ws") / F.col("denom"), 6).alias("p_mix"),
            F.round(
                (F.col("ws") / F.col("denom"))
                / (F.col("n_tokens").cast("double") / F.col("T")),
                6,
            ).alias("boost"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# x45 — weighted sampling without replacement (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------

_WS_K = 100
_KNUTH = 2654435761
_TWO32 = 4294967296

_WSAMPLE_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id, n_chars,
           ln((CAST((doc_id * {_KNUTH}) % {_TWO32} AS DOUBLE) + 1)
              / {_TWO32}) / CAST(n_chars AS DOUBLE) AS es_key
    FROM documents
    WHERE n_chars > 0
),
topk AS (
    SELECT * FROM keyed ORDER BY es_key DESC, doc_id LIMIT {_WS_K}
)
SELECT doc_id, n_chars, round(es_key, 9) AS es_key
FROM topk ORDER BY doc_id
"""


@q(
    "x45_weighted_sample",
    "OP-X4-ext",
    "Weighted sampling WITHOUT replacement (Efraimidis–Spirakis "
    "A-ES): key_i = ln(u_i)/w_i with u_i a deterministic Knuth-hash "
    f"uniform in (0,1] and w_i = n_chars; the {_WS_K} largest keys "
    "are distributed exactly as sequential weighted draws without "
    "replacement. The sample is reproducible on ANY partitioning "
    "(key is a pure row function) and needs no global sort: top-k "
    "compiles to TakeOrderedAndProject (per-partition heaps). The "
    "standard scale recipe for quality-weighted corpus subsampling — "
    "contrast x26 (uniform fixed-k) and x9 (stratified).",
    _WSAMPLE_ORACLE,
)
def x45_weighted_sample(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        ((F.col("doc_id") * _KNUTH) % _TWO32).cast("double") + 1
    ) / F.lit(float(_TWO32))
    keyed = d.select(
        "doc_id",
        "n_chars",
        (F.log(u) / F.col("n_chars").cast("double")).alias("es_key"),
    )
    return (
        keyed.orderBy(F.desc("es_key"), "doc_id")
        .limit(_WS_K)
        .select("doc_id", "n_chars", F.round("es_key", 9).alias("es_key"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x46 — PMI collocations (association-scored adjacent pairs)
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 20
_PMI_TOPK = 40

_PMI_ORACLE = f"""
WITH tok AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       w -> w <> '') AS ws
    FROM documents
),
t AS (
    SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos
    FROM tok
),
uni AS (
    SELECT w, CAST(count(*) AS DOUBLE) AS c,
           CAST(SUM(count(*)) OVER () AS DOUBLE) AS U
    FROM t GROUP BY w
),
bi AS (
    SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS DOUBLE) AS cab
    FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY 1, 2
),
btot AS (SELECT CAST(SUM(cab) AS DOUBLE) AS B FROM bi),
scored AS (
    SELECT w1, w2, cab,
           ln((cab / B) / ((ua.c / ua.U) * (ub.c / ub.U))) AS pmi
    FROM bi CROSS JOIN btot
    JOIN uni ua ON bi.w1 = ua.w
    JOIN uni ub ON bi.w2 = ub.w
    WHERE cab >= {_PMI_MIN_COUNT}
)
SELECT w1, w2, CAST(cab AS BIGINT) AS c, round(pmi, 6) AS pmi
FROM scored
ORDER BY round(pmi, 6) DESC, w1, w2 LIMIT {_PMI_TOPK}
"""


@q(
    "x46_pmi_collocations",
    "OP-X4-ext",
    "PMI-scored collocations: pointwise mutual information "
    "ln(p(ab)/(p(a)p(b))) over adjacent word pairs with support "
    f"≥ {_PMI_MIN_COUNT} — the association measure behind phrase/vocab "
    "induction (x16 ranks bigrams by raw count; PMI surfaces pairs "
    "that co-occur MORE than their unigram frequencies predict). "
    "Bigrams via the arrays_zip tail-zip (codegen, no per-doc window "
    "shuffle); unigram LM and the bigram total broadcast back onto "
    "the support-filtered bigram table; ln on identical IEEE doubles, "
    "ordering on the ROUNDED score with (w1, w2) tie-break so the "
    "top-k cut is engine-stable.",
    _PMI_ORACLE,
)
def x46_pmi_collocations(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    toks = d.select(ws.alias("ws"))
    uni = (
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("double").alias("c"))
    )
    utot = uni.agg(F.sum(F.col("c").cast("decimal(28,2)")).cast("double").alias("U"))
    pairs = (
        toks.filter(F.size("ws") > 1)
        .select(
            F.arrays_zip(
                F.slice("ws", 1, F.size("ws") - 1).alias("a"),
                F.slice("ws", 2, F.size("ws") - 1).alias("b"),
            ).alias("z")
        )
        .select(F.explode("z").alias("p"))
        .select(F.col("p.a").alias("w1"), F.col("p.b").alias("w2"))
    )
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("cab"))
    btot = bi.agg(F.sum(F.col("cab").cast("decimal(28,2)")).cast("double").alias("B"))
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("ca"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("cb"))
    pmi = F.log(
        (F.col("cab") / F.col("B"))
        / ((F.col("ca") / F.col("U")) * (F.col("cb") / F.col("U")))
    )
    return (
        bi.filter(F.col("cab") >= _PMI_MIN_COUNT)
        .join(F.broadcast(btot))
        .join(F.broadcast(utot))
        .join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .select(
            "w1",
            "w2",
            F.col("cab").cast("long").alias("c"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOPK)
    )
