"""Round-11 catalog entries — pre-training mix planning, dedup
survivorship, tokenizer fertility, distribution-band filtering.

* **x50_mix_epochs** — the capped mixture allocation (UniMax-style):
  temperature weights (α=0.3, as x44) allocate a fixed token budget
  across sources, but no source may be repeated more than MAX_EPOCHS
  times — the quota is min(share·budget, cap·tokens). This is the
  planning table an actual 100 TB mix is sampled from: x44 gives the
  ideal shares, this gives the realizable ones.
* **x51_dedup_survivorship** — near-exact dedup clusters (canonical
  text form, as x1c) with a QUALITY-based survivor instead of
  keep-min-id: longest doc wins, ties to smallest id, plus the full
  member manifest — the audit trail a curation pipeline keeps when it
  drops data.
* **x55_tokenizer_fertility** — tokens-per-word by (source, lang):
  BPE-ish subword count over whitespace word count. Fertility is the
  standard tokenizer-efficiency diagnostic for multilingual corpora
  (high fertility = the tokenizer fragments that language).
* **x56_length_band_filter** — keep documents inside the per-source
  [p5, p95] length band: exact percentiles per group, broadcast back,
  filter. The distribution-relative form of a length filter (fixed
  thresholds are wrong across heterogeneous sources).

Hash-parity conventions as plans/queries.py; percentile parity holds
because both engines define continuous quantiles by the same
(n−1)·q linear interpolation on identical integer inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# x50 — capped temperature-mixture allocation (token budget → quotas)
# ---------------------------------------------------------------------------

_ALPHA = 0.3
_BUDGET = 2_000_000  # tokens to allocate
_MAX_EPOCHS = 4.0  # no source repeats more than this

_MIX_EPOCHS_ORACLE = f"""
WITH tok AS (
    SELECT source,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+'))
           END AS n_tok
    FROM documents
),
per_src AS (
    SELECT source, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM tok GROUP BY source
),
w AS (SELECT *, pow(CAST(n_tokens AS DOUBLE), {_ALPHA}) AS ws FROM per_src),
tot AS (
    SELECT CAST(SUM(CAST(ws AS DECIMAL(28,12))) AS DOUBLE) AS denom FROM w
)
SELECT source, n_tokens,
       round(ws / denom, 6) AS p_mix,
       round(LEAST((ws / denom) * {_BUDGET},
                   {_MAX_EPOCHS} * CAST(n_tokens AS DOUBLE)), 2) AS quota_tokens,
       round(LEAST((ws / denom) * {_BUDGET},
                   {_MAX_EPOCHS} * CAST(n_tokens AS DOUBLE))
             / CAST(n_tokens AS DOUBLE), 6) AS epochs
FROM w CROSS JOIN tot
ORDER BY source
"""


@q(
    "x50_mix_epochs",
    "OP-X4-ext",
    "Capped mixture allocation (the UniMax recipe): temperature "
    "shares (alpha=0.3) allocate a fixed token budget per source, "
    "clipped so no source exceeds MAX_EPOCHS repetitions — "
    "quota = min(share * budget, cap * tokens_s). One token-count agg "
    "(map-side combined), a source-count-sized weight table with a "
    "decimal-exact denominator, pure IEEE pow/div/min on bit-identical "
    "inputs in both engines. The output is the realizable sampling "
    "plan a 100 TB mix is drawn with (x44 gives the ideal shares, "
    "x45 executes the draw).",
    _MIX_EPOCHS_ORACLE,
)
def x50_mix_epochs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    per_src = d.select("source", n_tok.alias("n_tok")).groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("n_tokens")
    )
    w = per_src.withColumn(
        "ws", F.pow(F.col("n_tokens").cast("double"), F.lit(_ALPHA))
    )
    denom = w.agg(
        F.sum(F.col("ws").cast("decimal(28,12)")).cast("double").alias("denom")
    )
    quota = F.least(
        (F.col("ws") / F.col("denom")) * F.lit(float(_BUDGET)),
        F.lit(_MAX_EPOCHS) * F.col("n_tokens").cast("double"),
    )
    return (
        w.join(F.broadcast(denom))
        .select(
            "source",
            "n_tokens",
            F.round(F.col("ws") / F.col("denom"), 6).alias("p_mix"),
            F.round(quota, 2).alias("quota_tokens"),
            F.round(quota / F.col("n_tokens").cast("double"), 6).alias("epochs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# x51 — dedup survivorship manifest (quality-based keep + audit trail)
# ---------------------------------------------------------------------------

_SURVIVOR_ORACLE = """
WITH n AS (
    SELECT doc_id, n_chars,
           trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
    FROM documents
),
n2 AS (SELECT * FROM n WHERE norm <> ''),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY norm
                                 ORDER BY n_chars DESC, doc_id) AS rn
    FROM n2
),
grp AS (
    SELECT norm, CAST(count(*) AS BIGINT) AS n_members,
           string_agg(doc_id, ',' ORDER BY doc_id) AS member_ids
    FROM n2 GROUP BY norm
)
SELECT ranked.doc_id AS survivor_id, ranked.n_chars AS survivor_chars,
       grp.n_members, grp.member_ids
FROM ranked JOIN grp USING (norm)
WHERE ranked.rn = 1
ORDER BY survivor_id
"""


@q(
    "x51_dedup_survivorship",
    "OP-X1-ext",
    "Dedup survivorship manifest: canonical-form clusters (as x1c) "
    "where the SURVIVOR is chosen by quality — longest doc wins, ties "
    "to smallest id — and every cluster carries its member list, the "
    "audit trail curation keeps when it drops data. One shuffle of "
    "(norm-key, id, n_chars); the deterministic argmax is "
    "max(struct(n_chars, -doc_id)) folded into the same aggregation "
    "as the member manifest — no second pass, no window sort of the "
    "corpus (the oracle uses the window form; same result).",
    _SURVIVOR_ORACLE,
)
def x51_dedup_survivorship(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), r"\s+", " "
        )
    )
    best = F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nid")))
    return (
        d.select("doc_id", "n_chars", norm.alias("norm"))
        .filter(F.col("norm") != "")
        .groupBy("norm")
        .agg(
            best.alias("b"),
            F.count("*").cast("long").alias("n_members"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "member_ids"
            ),
        )
        .select(
            (-F.col("b.nid")).alias("survivor_id"),
            F.col("b.n_chars").alias("survivor_chars"),
            "n_members",
            "member_ids",
        )
        .orderBy("survivor_id")
    )


# ---------------------------------------------------------------------------
# x55 — tokenizer fertility by (source, lang)
# ---------------------------------------------------------------------------

_BPE_SQL = r"len(regexp_extract_all(text, '''?[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]'))"

_FERTILITY_ORACLE = f"""
WITH t AS (
    SELECT source, lang,
           {_BPE_SQL} AS n_bpe,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+'))
           END AS n_ws
    FROM documents
)
SELECT source, lang,
       CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
       CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
       round(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws), 6) AS fertility
FROM t
GROUP BY source, lang
HAVING SUM(n_ws) > 0
ORDER BY source, lang
"""


@q(
    "x55_tokenizer_fertility",
    "OP-X4-ext",
    "Tokenizer fertility by (source, lang): BPE-ish subword count "
    "over whitespace word count — the standard tokenizer-efficiency "
    "diagnostic for multilingual corpus work (fertility >> 1 means "
    "the tokenizer fragments that slice of the corpus, inflating its "
    "effective cost in the mix). Both counts are per-row codegen "
    "regex work folded into one map-side-combined agg; the sums are "
    "integers (exact), the single divide is the only IEEE op.",
    _FERTILITY_ORACLE,
)
def x55_tokenizer_fertility(spark, sf_dir):
    from ravelytics_spark.functions.text import tokenize_bpe_ish

    d = load_table(spark, sf_dir, "documents")
    n_ws = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    return (
        d.select(
            "source",
            "lang",
            F.size(tokenize_bpe_ish("text")).alias("n_bpe"),
            n_ws.alias("n_ws"),
        )
        .groupBy("source", "lang")
        .agg(
            F.sum("n_bpe").cast("long").alias("bpe_tokens"),
            F.sum("n_ws").cast("long").alias("ws_tokens"),
        )
        .filter(F.col("ws_tokens") > 0)
        .select(
            "source",
            "lang",
            "bpe_tokens",
            "ws_tokens",
            F.round(
                F.col("bpe_tokens").cast("double") / F.col("ws_tokens"), 6
            ).alias("fertility"),
        )
        .orderBy("source", "lang")
    )


# ---------------------------------------------------------------------------
# x56 — per-source [p5, p95] length-band filter
# ---------------------------------------------------------------------------

_BAND_ORACLE = """
WITH band AS (
    SELECT source,
           quantile_cont(n_chars, 0.05) AS p5,
           quantile_cont(n_chars, 0.95) AS p95
    FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN band USING (source)
WHERE d.n_chars >= band.p5 AND d.n_chars <= band.p95
ORDER BY d.doc_id
"""


@q(
    "x56_length_band_filter",
    "OP-X4-ext",
    "Distribution-relative length filter: keep documents inside their "
    "SOURCE's [p5, p95] length band (fixed thresholds are wrong "
    "across heterogeneous sources — a p5 tweet and a p5 book differ "
    "by orders of magnitude). Exact per-source percentiles (one "
    "agg; the percentile state is a per-group sort but groups are "
    "source-sized slices, and the approx_percentile swap is the "
    "documented 100 TB form), broadcast of the source-count-sized "
    "band table back onto the scan, filter pushes nothing (the band "
    "is data-dependent) but reads only (doc_id, source, n_chars). "
    "Percentile parity: both engines interpolate at rank (n-1)*q on "
    "identical integer inputs.",
    _BAND_ORACLE,
)
def x56_length_band_filter(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    band = d.groupBy("source").agg(
        F.percentile("n_chars", F.lit(0.05)).alias("p5"),
        F.percentile("n_chars", F.lit(0.95)).alias("p95"),
    )
    return (
        d.join(F.broadcast(band), "source")
        .filter((F.col("n_chars") >= F.col("p5")) & (F.col("n_chars") <= F.col("p95")))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )
