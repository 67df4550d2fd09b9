"""Round-34 operators — STAGED (round 11), registration deferred.

The round-11 certification window is exactly full (29 round-31/32
registrations + 3 round-33 portable twins + 18 harness re-runs = 50;
COVERAGE.md 'Certification window' is the arithmetic source of truth),
so this batch targets the ROUND-12 window — built, oracle-twinned and
pytest-tested now, registered when its window opens. The
round-23..33 staging contract, one round further ahead.

Batch: 10 entries (x345-x353 + x355; an eleventh, an RI scorecard,
was built and then dropped pre-commit as a duplicate of the already-
certified x181_fk_integrity).

Theme: warehouse data-engineering mechanics (the layer every 100 TB
deployment runs between queries) plus the nonparametric test tier the
x168/x169/x155 entries started:

* ``x345_zorder_keys`` — Morton (Z-order) interleave of the
  (price-cell, date-cell) pair into a 16-bit clustering key, plus the
  per-key-block min/max envelope that makes the key USEFUL: sorting a
  100 TB table by zkey gives every file a tight 2-D bounding box, so
  a (price AND date) predicate prunes files on BOTH dimensions — the
  multi-dim layout story one sort key alone cannot give. Bit
  interleave is exact integer shifts/masks in both engines.
* ``x346_compaction_plan`` — the small-files compactor's assignment:
  per source partition, documents packed in doc_id order into target-
  size output bins via a cumulative-size window (the contiguous
  packing real compactors use — preserves sort order, one pass, no
  reshuffle of file contents). Emits per-bin file counts and byte
  loads; the ops answer to the #1 operational failure mode of big
  parquet lakes.
* ``x351_weighted_sample`` — deterministic weighted top-k sampling:
  priority = md5_48(doc_id) / weight, ONE IEEE division (correctly
  rounded -> bit-identical across engines), smallest-k kept with
  doc_id tie-break. Heavier docs get proportionally smaller
  priorities, so selection is weight-biased yet exactly reproducible
  across engines, partitionings and reruns — the weighted companion
  of x99's uniform hash membership. Selection itself is
  hash-certified.
* ``x355_incremental_dedup`` — the append-only dedup contract: a
  deterministic hash split carves the corpus into an already-ingested
  generation and a new batch; the new batch dedups against (corpus +
  itself) WITHOUT re-pairing the old generation (anti-join on content
  hash + keep-min within the batch) — certifying that incremental
  ingestion needs only |new| x index work, never |corpus|^2, which is
  the only dedup shape that survives daily 100 TB appends.

Nonparametric tier (wave 2):

* ``x347_mann_kendall`` — the Mann-Kendall trend TEST (exact integer
  S over the bounded monthly frame, tie-corrected variance, z in
  milli): the significance gate in front of x155's Theil-Sen slope.
* ``x348_kruskal_wallis`` — k-group rank ANOVA over order priorities
  (integer doubled-average-ranks so ties stay exact), tie-corrected H
  in milli: the k-sample extension of x168's two-sample test.
* ``x349_wilcoxon_signed_rank`` — PAIRED location test on each
  customer's first->second order spend delta (doubled ranks of |d|,
  zeros dropped, tie-corrected z): the within-subject companion the
  independent-sample tests cannot replace.
* ``x350_kendall_tau`` — tau-b between monthly order count and
  revenue from exact concordant/discordant pair counts on the
  bounded monthly frame: the rank-correlation triangle-closer next
  to Spearman (x169) and Pearson (x67).
* ``x353_doc_repetition`` — per-document repetition profile (dup
  5-gram mass and dup-token mass, ppm): the Gopher repetition
  signals x27's length rules deliberately skip; one tokenize, one
  per-doc window, map-side-combined aggs.

Hash-parity conventions as plans/queries.py: exact cents/BIGINT
arithmetic until one shared IEEE expression, total ORDER BY, BIGINT
casts on every count.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import Query
from ravelytics_spark.sources.tables import load_table

STAGED: dict[str, Query] = {}


def _staged(name: str, op_id: str, doc: str, oracle: str | None = None):
    def deco(fn):
        STAGED[name] = Query(name, op_id, doc, fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# x345 — Z-order (Morton) clustering keys + per-block pruning envelope
# ---------------------------------------------------------------------------

_Z_PRICE_PER_CELL = 200_000  # cents per price cell (0..249 over the domain)
_Z_DAYS_PER_CELL = 16  # days per date cell (0..218 over the domain)

# bit interleave a (even positions) and b (odd positions), 8 bits each
_Z_INTERLEAVE = " | ".join(
    f"(((a >> {i}) & 1) << {2 * i}) | (((b >> {i}) & 1) << {2 * i + 1})"
    for i in range(8)
)

_ZORDER_ORACLE = f"""
WITH cells AS (
    SELECT least(255, CAST(round(o_totalprice * 100) AS BIGINT)
                      // {_Z_PRICE_PER_CELL}) AS a,
           least(255, date_diff('day', DATE '1992-01-01',
                                CAST(o_orderdate AS DATE))
                      // {_Z_DAYS_PER_CELL}) AS b
    FROM orders
),
keyed AS (
    SELECT a, b, ({_Z_INTERLEAVE}) AS zkey FROM cells
)
SELECT CAST(zkey // 1024 AS BIGINT) AS zblock,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(a) AS BIGINT) AS a_min, CAST(max(a) AS BIGINT) AS a_max,
       CAST(min(b) AS BIGINT) AS b_min, CAST(max(b) AS BIGINT) AS b_max
FROM keyed GROUP BY 1 ORDER BY zblock
"""


@_staged(
    "x345_zorder_keys",
    "OP-S11/P3-ext",
    "Morton (Z-order) clustering key: bucketize (price, date) to 8-bit "
    "cells, interleave the bits (exact integer shifts/masks, identical "
    "in both engines) into a 16-bit zkey, then emit each 1024-key "
    "block's row count and 2-D min/max envelope. The envelope IS the "
    "value: files written in zkey order carry tight bounding boxes on "
    "BOTH dimensions, so a conjunctive (price AND date) predicate "
    "prunes on min/max stats in each — the multi-dimensional layout "
    "trick (Bayer 1996 UB-tree lineage; Delta/Iceberg OPTIMIZE ZORDER "
    "is the same construction) that a single-column sort cannot give. "
    "Plan: map-only cell+interleave expressions, ONE map-side-combined "
    "64-group agg. 100 TB: zkey becomes the table's sort/cluster "
    "column; this entry certifies the key math and the envelope "
    "tightness a pruner would consume.",
    _ZORDER_ORACLE,
)
def x345_zorder_keys(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    a = F.least(F.lit(255), (cents / F.lit(_Z_PRICE_PER_CELL)).cast("long"))
    days = F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
    b = F.least(F.lit(255), (days / F.lit(_Z_DAYS_PER_CELL)).cast("long"))
    keyed = o.select(a.alias("a"), b.alias("b")).select(
        "a", "b", F.expr(_Z_INTERLEAVE).alias("zkey")
    )
    return (
        keyed.groupBy(F.expr("zkey DIV 1024").cast("long").alias("zblock"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("a").cast("long").alias("a_min"),
            F.max("a").cast("long").alias("a_max"),
            F.min("b").cast("long").alias("b_min"),
            F.max("b").cast("long").alias("b_max"),
        )
        .orderBy("zblock")
    )


# ---------------------------------------------------------------------------
# x346 — small-files compaction plan (contiguous target-size binning)
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 100_000  # bytes per output bin

_COMPACT_ORACLE = f"""
WITH sized AS (
    SELECT source, doc_id, n_chars,
           SUM(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM documents WHERE n_chars IS NOT NULL
)
SELECT source, CAST((cum - n_chars) // {_COMPACT_TARGET} AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS bytes
FROM sized GROUP BY 1, 2 ORDER BY source, bin
"""


@_staged(
    "x346_compaction_plan",
    "OP-S11-ext",
    "Small-files compaction assignment: per source partition, files "
    "(documents, sized by n_chars) pack in doc_id order into "
    f"~{_COMPACT_TARGET}-byte output bins via bin = "
    "(cumulative_size - own_size) DIV target — the contiguous packing "
    "real compactors (Delta OPTIMIZE, Iceberg rewrite_data_files) "
    "use, because it preserves sort order and plans in ONE pass with "
    "no content reshuffle. Emits each bin's file count and byte load "
    "(every bin lands in [target, target + max_file) except the last "
    "per partition — the property tests pin it). Plan: one "
    "per-partition cumulative window + one map-side-combined agg. "
    "100 TB: this is the metadata-only planning query an OPTIMIZE "
    "job runs before touching any data file.",
    _COMPACT_ORACLE,
)
def x346_compaction_plan(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sized = d.select(
        "source",
        "n_chars",
        F.sum("n_chars").over(w).alias("cum"),
    )
    return (
        sized.groupBy(
            "source",
            F.expr(f"(cum - n_chars) DIV {_COMPACT_TARGET}")
            .cast("long")
            .alias("bin"),
        )
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_chars").cast("long").alias("bytes"),
        )
        .orderBy("source", "bin")
    )


# ---------------------------------------------------------------------------
# x351 — deterministic weighted top-k sample (hash-priority)
# ---------------------------------------------------------------------------

_WS_K = 100

_WSAMPLE_ORACLE = f"""
WITH pri AS (
    SELECT doc_id, n_chars,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws'), 1, 12))
                AS BIGINT) AS h
    FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(floor(CAST(h AS DOUBLE) / CAST(n_chars AS DOUBLE) * 1000000.0)
            AS BIGINT) AS priority_micro
FROM pri
ORDER BY CAST(h AS DOUBLE) / CAST(n_chars AS DOUBLE), doc_id
LIMIT {_WS_K}
"""


@_staged(
    "x351_weighted_sample",
    "OP-X-ext",
    "Deterministic weighted top-k sample: priority = md5_48(doc_id) / "
    "weight (n_chars), keep the k smallest. The division is ONE IEEE "
    "op — correctly rounded, so bit-identical across engines — and "
    "the hash is a pure function of the key, so the SELECTION itself "
    "is hash-certified and reproducible across engines, partitionings "
    "and reruns (heavier docs draw proportionally smaller priorities, "
    "the weighted analog of x99's uniform membership; same family as "
    "the exponential-jitter A-ES scheme, with the portable division "
    "in place of the non-portable ln). Plan: map-only hash+divide, "
    "TakeOrderedAndProject(k) — per-partition heaps, no global sort, "
    "no shuffle of the corpus. 100 TB: the weighted-subset primitive "
    "for mixture construction where membership must be re-derivable "
    "(append jobs keep prior members, audits re-check from the key).",
    _WSAMPLE_ORACLE,
)
def x351_weighted_sample(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & (F.col("n_chars") > 0)
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ws"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    pri = h.cast("double") / F.col("n_chars").cast("double")
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            pri.alias("__pri"),
        )
        .orderBy("__pri", "doc_id")
        .limit(_WS_K)
        .select(
            "doc_id",
            "n_chars",
            # floor(pri * 1e6): multiply and floor are correctly
            # rounded IEEE ops -> bit-identical across engines, where
            # round(double, 6) on a ~1e10 value differs in the last
            # ulp between engines (found at first certification)
            F.floor(F.col("__pri") * F.lit(1000000.0))
            .cast("long")
            .alias("priority_micro"),
        )
    )


# ---------------------------------------------------------------------------
# x355 — incremental (append-only) dedup contract
# ---------------------------------------------------------------------------

_INC_ORACLE = """
WITH gen AS (
    SELECT doc_id, md5(text) AS h,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':gen'), 1, 8))
                AS BIGINT) % 10 AS g
    FROM documents WHERE text IS NOT NULL
),
corpus AS (SELECT DISTINCT h FROM gen WHERE g < 7),
batch AS (SELECT doc_id, h FROM gen WHERE g >= 7),
fresh AS (
    SELECT b.doc_id, b.h FROM batch b
    WHERE b.h NOT IN (SELECT h FROM corpus)
)
SELECT doc_id FROM fresh
WHERE doc_id = (SELECT min(f2.doc_id) FROM fresh f2 WHERE f2.h = fresh.h)
ORDER BY doc_id
"""


@_staged(
    "x355_incremental_dedup",
    "OP-X1-ext",
    "The append-only dedup contract: a deterministic hash split "
    "carves documents into an already-ingested corpus generation "
    "(md5 split 70%) and a new batch (30%); the batch keeps exactly "
    "the rows whose content hash (md5(text)) is absent from the "
    "corpus index AND that win keep-min-doc_id within the batch "
    "itself. This is the ONLY dedup shape that survives daily "
    "appends at 100 TB: each ingest pays |new| hash lookups against "
    "a materialized hash index plus one |new|-sized keep-min agg — "
    "never re-pairing the corpus (x1's full-corpus form is the "
    "bootstrap, this is the steady state). Plan: one anti-join "
    "(batch side small -> broadcastable index probe at scale; here "
    "AQE decides) + one map-side-combined min agg. The hash match "
    "certifies the whole incremental semantics, including the "
    "batch-internal tie-break.",
    _INC_ORACLE,
)
def x355_incremental_dedup(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    g = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit(":gen"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(10),
    )
    gen = d.select("doc_id", F.md5("text").alias("h"), g.alias("g"))
    corpus = gen.filter(F.col("g") < 7).select("h").distinct()
    batch = gen.filter(F.col("g") >= 7).select("doc_id", "h")
    fresh = batch.join(corpus, "h", "left_anti")
    return (
        fresh.groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x347 — Mann-Kendall trend test over monthly order counts
# ---------------------------------------------------------------------------

_MK_ORACLE = """
WITH m AS (
    SELECT strftime(o_orderdate, '%Y%m') AS mon,
           CAST(count(*) AS BIGINT) AS c
    FROM orders GROUP BY 1
),
s AS (
    SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1
                         WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s
    FROM m a JOIN m b ON a.mon < b.mon
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
ties AS (
    SELECT CAST(coalesce(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
        AS tie18
    FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM m GROUP BY c)
    WHERE t > 1
)
SELECT nn.n, s.s,
       CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie18 AS BIGINT)
           AS var18,
       CAST(CASE WHEN nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie18 > 0
            THEN floor(1000.0 * CAST(s.s - CASE WHEN s.s > 0 THEN 1
                                              WHEN s.s < 0 THEN -1
                                              ELSE 0 END AS DOUBLE)
                 / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie18
                             AS DOUBLE) / 18.0))
            END AS BIGINT) AS z_milli
FROM s, nn, ties
"""


@_staged(
    "x347_mann_kendall",
    "OP-G6/W4-ext",
    "Mann-Kendall trend test on monthly order counts: S = sum of "
    "sign(c_j - c_i) over time-ordered month pairs (exact BIGINT from "
    "the BOUNDED ~80-row monthly aggregate — the pair join is a "
    "broadcast nested-loop over a frame that is small BY CONSTRUCTION "
    "at any corpus size, since months don't grow with rows), "
    "tie-corrected variance kept as the exact integer 18*Var, and the "
    "continuity-corrected z through one shared IEEE chain in milli. "
    "The distribution-free significance gate in front of x155's "
    "Theil-Sen slope estimate (Mann 1945 / Kendall 1975, public "
    "method). Plan: one month agg (map-side combined) -> bounded "
    "pair join + bounded tie agg -> single row.",
    _MK_ORACLE,
)
def x347_mann_kendall(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format("o_orderdate", "yyyyMM").alias("mon")
    ).agg(F.count("*").cast("long").alias("c"))
    a, b = m.alias("a"), m.alias("b")
    s = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a.mon") < F.col("b.mon"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    nn = m.agg(F.count("*").cast("long").alias("n"))
    ties = (
        m.groupBy("c")
        .agg(F.count("*").cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie18")
        )
    )
    var18 = F.expr("n * (n - 1) * (2 * n + 5) - tie18")
    sgn = F.when(F.col("s") > 0, 1).when(F.col("s") < 0, -1).otherwise(0)
    return (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            "n",
            "s",
            var18.cast("long").alias("var18"),
            F.when(
                var18 > 0,
                F.floor(
                    F.lit(1000.0)
                    * (F.col("s") - sgn).cast("double")
                    / F.sqrt(var18.cast("double") / F.lit(18.0))
                ),
            )
            .cast("long")
            .alias("z_milli"),
        )
    )


# ---------------------------------------------------------------------------
# x350 — Kendall tau-b between monthly order count and revenue
# ---------------------------------------------------------------------------

_TAU_ORACLE = """
WITH m AS (
    SELECT strftime(o_orderdate, '%Y%m') AS mon,
           CAST(count(*) AS BIGINT) AS x,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y
    FROM orders GROUP BY 1
),
p AS (
    SELECT
        CAST(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS nc,
        CAST(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS nd,
        CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
        CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty,
        CAST(count(*) AS BIGINT) AS n0
    FROM m a JOIN m b ON a.mon < b.mon
)
SELECT n0, nc, nd,
       CAST(CASE WHEN (n0 - tx) * (n0 - ty) > 0
            THEN floor(1000.0 * CAST(nc - nd AS DOUBLE)
                 / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)))
            END AS BIGINT) AS tau_milli
FROM p
"""


@_staged(
    "x350_kendall_tau",
    "OP-G6-ext",
    "Kendall tau-b between monthly order count and monthly revenue: "
    "concordant/discordant/tied pair counts as exact BIGINTs over the "
    "bounded monthly frame (broadcast nested-loop pair join — months "
    "don't grow with corpus size), tau-b = (nc - nd) / "
    "sqrt((n0 - tx)(n0 - ty)) through one shared IEEE chain in milli. "
    "Closes the rank-correlation triangle next to Spearman (x169) and "
    "Pearson (x67): tau's pair semantics are robust to the monotone "
    "distortions that move rho. Plan: one month agg -> one bounded "
    "pair agg -> single row.",
    _TAU_ORACLE,
)
def x350_kendall_tau(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format("o_orderdate", "yyyyMM").alias("mon")
    ).agg(
        F.count("*").cast("long").alias("x"),
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("y"),
    )
    a, b = m.alias("a"), m.alias("b")
    dxy = (F.col("b.x") - F.col("a.x")) * (F.col("b.y") - F.col("a.y"))
    p = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a.mon") < F.col("b.mon"))
        .agg(
            F.sum(F.when(dxy > 0, 1).otherwise(0)).cast("long").alias("nc"),
            F.sum(F.when(dxy < 0, 1).otherwise(0)).cast("long").alias("nd"),
            F.sum(F.when(F.col("a.x") == F.col("b.x"), 1).otherwise(0))
            .cast("long")
            .alias("tx"),
            F.sum(F.when(F.col("a.y") == F.col("b.y"), 1).otherwise(0))
            .cast("long")
            .alias("ty"),
            F.count("*").cast("long").alias("n0"),
        )
    )
    den = (F.col("n0") - F.col("tx")) * (F.col("n0") - F.col("ty"))
    return p.select(
        "n0",
        "nc",
        "nd",
        F.when(
            den > 0,
            F.floor(
                F.lit(1000.0)
                * (F.col("nc") - F.col("nd")).cast("double")
                / F.sqrt(
                    (F.col("n0") - F.col("tx")).cast("double")
                    * (F.col("n0") - F.col("ty")).cast("double")
                )
            ),
        )
        .cast("long")
        .alias("tau_milli"),
    )


# ---------------------------------------------------------------------------
# x348 — Kruskal-Wallis rank ANOVA across order priorities
# ---------------------------------------------------------------------------

_KW_BUCKET = 524_288  # cents per rank bucket (~96 buckets over the domain)
_KW_GROUPS = [
    ("1-URGENT", "urgent"),
    ("2-HIGH", "high"),
    ("3-MEDIUM", "medium"),
    ("4-NOT SPECIFIED", "notspec"),
    ("5-LOW", "low"),
]

# the shared IEEE chain: H = 12/(N(N+1)) * sum((R2_g/2)^2 / n_g) - 3(N+1),
# tie-corrected by C = 1 - tie3/(N^3 - N); terms in FIXED literal group
# order so the floating sum is order-identical in both engines
_KW_TERMS_SQL = " + ".join(
    f"(CASE WHEN n_{a} > 0 THEN (CAST(r2_{a} AS DOUBLE) * 0.5)"
    f" * (CAST(r2_{a} AS DOUBLE) * 0.5) / CAST(n_{a} AS DOUBLE)"
    f" ELSE 0.0 END)"
    for _, a in _KW_GROUPS
)
_KW_H_SQL = (
    f"(12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))"
    f" * ({_KW_TERMS_SQL}) - 3.0 * CAST(n + 1 AS DOUBLE))"
)
_KW_C_SQL = (
    "(1.0 - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
    " * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))"
)

_KW_PIVOT_SQL = ",\n           ".join(
    f"CAST(coalesce(SUM(CASE WHEN g = '{lit}' THEN cgv END), 0) AS BIGINT)"
    f" AS n_{a},\n           "
    f"CAST(coalesce(SUM(CASE WHEN g = '{lit}' THEN cgv * r2 END), 0)"
    f" AS BIGINT) AS r2_{a}"
    for lit, a in _KW_GROUPS
)

_KW_ORACLE = f"""
WITH vals AS (
    SELECT o_orderpriority AS g,
           CAST(round(o_totalprice * 100) AS BIGINT) AS v
    FROM orders
),
gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cgv FROM vals GROUP BY 1, 2),
vc AS (SELECT v, CAST(SUM(cgv) AS BIGINT) AS cnt FROM gv GROUP BY 1),
rk AS (
    SELECT v, cnt,
           2 * coalesce(SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cnt + 1 AS r2
    FROM vc
),
piv AS (
    SELECT {_KW_PIVOT_SQL}
    FROM gv JOIN rk ON gv.v = rk.v
),
tot AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS n,
           CAST(coalesce(SUM(CASE WHEN cnt > 1
                                  THEN cnt * cnt * cnt - cnt END), 0)
                AS BIGINT) AS tie3
    FROM vc
)
SELECT tot.n, tot.tie3,
       {", ".join(f"piv.n_{a}, piv.r2_{a}" for _, a in _KW_GROUPS)},
       CAST(CASE WHEN tot.n > 1 AND {_KW_C_SQL} > 0
            THEN floor(1000.0 * {_KW_H_SQL} / {_KW_C_SQL})
            END AS BIGINT) AS h_milli
FROM piv, tot
"""


@_staged(
    "x348_kruskal_wallis",
    "OP-G6-ext",
    "Kruskal-Wallis rank ANOVA of order spend across the 5 priority "
    "classes: global average ranks kept EXACT as doubled integers "
    "(2*avg_rank = 2*count_less + tied + 1), per-group rank sums as "
    "BIGINTs, tie-corrected H through one shared IEEE chain whose "
    "5 group terms add in fixed literal order (floating addition is "
    "order-identical only if the order is pinned). The k-sample "
    "extension of x168's two-sample Mann-Whitney (Kruskal & Wallis "
    "1952, public method). SCALE: the global ranking avoids any "
    "corpus-sized single-partition window via two-level prefix "
    "counts — per-value counts bucket by cents DIV 524288 (~96 "
    "buckets), the ~96-row bucket frame takes the only unpartitioned "
    "window (bounded BY CONSTRUCTION), and within-bucket cumulative "
    "counts run partitioned by bucket — the distributed "
    "order-statistics idiom a 100 TB ranking must use.",
    _KW_ORACLE,
)
def x348_kruskal_wallis(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    vals = o.select(
        F.col("o_orderpriority").alias("g"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("v"),
    )
    gv = vals.groupBy("g", "v").agg(F.count("*").cast("long").alias("cgv"))
    vc = gv.groupBy("v").agg(F.sum("cgv").cast("long").alias("cnt"))
    # two-level exact ranks: bucket prefix totals (bounded frame) +
    # within-bucket cumulative
    vb = vc.withColumn("bucket", F.expr(f"v DIV {_KW_BUCKET}"))
    bt = vb.groupBy("bucket").agg(F.sum("cnt").alias("bcnt"))
    wprev = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bprev = bt.select(
        "bucket", F.coalesce(F.sum("bcnt").over(wprev), F.lit(0)).alias("bless")
    )
    win = Window.partitionBy("bucket").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rk = (
        vb.withColumn(
            "wless", F.coalesce(F.sum("cnt").over(win), F.lit(0))
        )
        .join(F.broadcast(bprev), "bucket")
        .select(
            "v",
            "cnt",
            (2 * (F.col("bless") + F.col("wless")) + F.col("cnt") + 1).alias(
                "r2"
            ),
        )
    )
    piv_aggs = []
    for lit, a in _KW_GROUPS:
        cond = F.col("g") == lit
        piv_aggs.append(
            F.coalesce(F.sum(F.when(cond, F.col("cgv"))), F.lit(0))
            .cast("long")
            .alias(f"n_{a}")
        )
        piv_aggs.append(
            F.coalesce(
                F.sum(F.when(cond, F.col("cgv") * F.col("r2"))), F.lit(0)
            )
            .cast("long")
            .alias(f"r2_{a}")
        )
    piv = gv.join(rk, "v").agg(*piv_aggs)
    tot = vc.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("cnt") > 1,
                    F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("tie3"),
    )
    out_cols = ["n", "tie3"]
    for _, a in _KW_GROUPS:
        out_cols += [f"n_{a}", f"r2_{a}"]
    return (
        piv.crossJoin(F.broadcast(tot))
        .select(
            *out_cols,
            F.when(
                (F.col("n") > 1) & (F.expr(_KW_C_SQL) > 0),
                F.floor(
                    F.lit(1000.0) * F.expr(_KW_H_SQL) / F.expr(_KW_C_SQL)
                ),
            )
            .cast("long")
            .alias("h_milli"),
        )
    )


# ---------------------------------------------------------------------------
# x349 — Wilcoxon signed-rank test on first->second order spend deltas
# ---------------------------------------------------------------------------

_WX_BUCKET = 524_288

_WX_ORACLE = f"""
WITH seq AS (
    SELECT o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
),
pairs AS (
    SELECT o_custkey,
           max(CASE WHEN rn = 2 THEN cents END)
           - max(CASE WHEN rn = 1 THEN cents END) AS d
    FROM seq WHERE rn <= 2 GROUP BY 1 HAVING count(*) = 2
),
nz AS (SELECT abs(d) AS absd, CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos
       FROM pairs WHERE d <> 0),
dc AS (
    SELECT absd, CAST(count(*) AS BIGINT) AS cnt,
           CAST(SUM(pos) AS BIGINT) AS pcnt
    FROM nz GROUP BY 1
),
rk AS (
    SELECT absd, cnt, pcnt,
           2 * coalesce(SUM(cnt) OVER (ORDER BY absd
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cnt + 1 AS r2
    FROM dc
),
agg AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS n,
           CAST(SUM(pcnt * r2) AS BIGINT) AS w2p,
           CAST(coalesce(SUM(CASE WHEN cnt > 1
                                  THEN cnt * cnt * cnt - cnt END), 0)
                AS BIGINT) AS tie3
    FROM rk
)
SELECT n, w2p, CAST(tie3 AS BIGINT) AS tie3,
       CAST(CASE WHEN 2.0 * CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
                      * CAST(2 * n + 1 AS DOUBLE) - CAST(tie3 AS DOUBLE) > 0.0
            THEN floor(1000.0
                 * CAST(w2p - n * (n + 1) // 2 AS DOUBLE)
                 / sqrt((2.0 * CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
                         * CAST(2 * n + 1 AS DOUBLE)
                         - CAST(tie3 AS DOUBLE)) / 12.0))
            END AS BIGINT) AS z_milli
FROM agg
"""


@_staged(
    "x349_wilcoxon_signed_rank",
    "OP-G6/W1-ext",
    "Wilcoxon signed-rank test on each repeat customer's first->second "
    "order spend delta: zero deltas dropped per the estimator, |d| "
    "ranks kept exact as doubled integers, W+ as the doubled BIGINT "
    "rank sum over positive deltas, tie-corrected variance as the "
    "exact integer 12*Var, continuity-free z through one shared IEEE "
    "chain in milli (Wilcoxon 1945, public method). The PAIRED "
    "location test the independent-sample x168/x348 tier cannot "
    "express — 'do customers spend more on their second order' with "
    "each customer as their own control. Plan: one per-customer "
    "window (partitioned — no global sort), one pair pivot, then the "
    "same bounded two-level ranking as x348 (bucket prefix counts + "
    "within-bucket windows; no corpus-sized single partition).",
    _WX_ORACLE,
)
def x349_wilcoxon_signed_rank(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    wseq = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = o.select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.row_number().over(wseq).alias("rn"),
    ).filter(F.col("rn") <= 2)
    pairs = (
        seq.groupBy("o_custkey")
        .agg(
            (
                F.max(F.when(F.col("rn") == 2, F.col("cents")))
                - F.max(F.when(F.col("rn") == 1, F.col("cents")))
            ).alias("d"),
            F.count("*").alias("k"),
        )
        .filter((F.col("k") == 2) & (F.col("d") != 0))
    )
    dc = (
        pairs.select(
            F.abs("d").alias("absd"),
            F.when(F.col("d") > 0, 1).otherwise(0).alias("pos"),
        )
        .groupBy("absd")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("pos").cast("long").alias("pcnt"),
        )
    )
    db = dc.withColumn("bucket", F.expr(f"absd DIV {_WX_BUCKET}"))
    bt = db.groupBy("bucket").agg(F.sum("cnt").alias("bcnt"))
    wprev = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bprev = bt.select(
        "bucket",
        F.coalesce(F.sum("bcnt").over(wprev), F.lit(0)).alias("bless"),
    )
    win = Window.partitionBy("bucket").orderBy("absd").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rk = (
        db.withColumn("wless", F.coalesce(F.sum("cnt").over(win), F.lit(0)))
        .join(F.broadcast(bprev), "bucket")
        .select(
            "cnt",
            "pcnt",
            (2 * (F.col("bless") + F.col("wless")) + F.col("cnt") + 1).alias(
                "r2"
            ),
        )
    )
    agg = rk.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("pcnt") * F.col("r2")).cast("long").alias("w2p"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("cnt") > 1,
                    F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("tie3"),
    )
    # the 12*Var product 2n(n+1)(2n+1) overflows BIGINT past n ~ 1.3M
    # (the 100x sweep caught it pre-registration), so the variance
    # chain runs in DOUBLE with a pinned op order — every *, -, /,
    # sqrt is correctly rounded, so both engines land on the same
    # bits; tie3 stays an exact BIGINT output
    var12d = F.expr(
        "2.0 * CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)"
        " * CAST(2 * n + 1 AS DOUBLE) - CAST(tie3 AS DOUBLE)"
    )
    return agg.select(
        "n",
        "w2p",
        F.col("tie3").cast("long").alias("tie3"),
        F.when(
            var12d > 0.0,
            F.floor(
                F.lit(1000.0)
                * (F.col("w2p") - F.expr("n * (n + 1) DIV 2")).cast("double")
                / F.sqrt(var12d / F.lit(12.0))
            ),
        )
        .cast("long")
        .alias("z_milli"),
    )


# ---------------------------------------------------------------------------
# x353 — per-document repetition profile (Gopher rep signals)
# ---------------------------------------------------------------------------

_REP_ORACLE = """
WITH tok AS (
    SELECT doc_id, w,
           row_number() OVER (PARTITION BY doc_id ORDER BY i) AS pos
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents WHERE text IS NOT NULL
    ) WHERE w <> ''
),
grams AS (
    SELECT doc_id, w, pos,
           CASE WHEN lead(w, 4) OVER (PARTITION BY doc_id ORDER BY pos)
                     IS NOT NULL
                THEN w || ' '
                     || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                     || ' '
                     || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos)
                     || ' '
                     || lead(w, 3) OVER (PARTITION BY doc_id ORDER BY pos)
                     || ' '
                     || lead(w, 4) OVER (PARTITION BY doc_id ORDER BY pos)
                END AS g5
    FROM tok
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST((count(*) - count(DISTINCT w)) * 1000000 // count(*)
            AS BIGINT) AS dup_token_ppm,
       CAST(CASE WHEN count(g5) > 0
                 THEN (count(g5) - count(DISTINCT g5)) * 1000000 // count(g5)
                 ELSE 0 END AS BIGINT) AS dup5_ppm
FROM grams GROUP BY 1 ORDER BY doc_id
"""


@_staged(
    "x353_doc_repetition",
    "OP-X4-ext",
    "Per-document repetition profile — the Gopher repetition signals "
    "(Rae et al. 2021, public method) x27's length rules deliberately "
    "skip: duplicate-token mass (n - distinct) and duplicate-5-gram "
    "mass as exact ppm of the respective stream. Boilerplate and "
    "looped generations score high here while passing every length "
    "rule. Plan: ONE tokenize (posexplode keeps order), per-doc lead "
    "windows build the 5-grams without materializing shingle "
    "explosion rows beyond 1x tokens, then a single map-side-combined "
    "per-doc agg (count distinct per doc is a partial-agg pattern, "
    "not a global one). 100 TB: everything partitions by doc_id; no "
    "corpus-wide state.",
    _REP_ORACLE,
)
def x353_doc_repetition(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    ).filter(F.col("w") != "")
    wdoc = Window.partitionBy("doc_id").orderBy("i")
    leads = [F.lead("w", k).over(wdoc) for k in range(1, 5)]
    g5 = F.when(
        leads[3].isNotNull(),
        F.concat(
            F.col("w"),
            F.lit(" "),
            leads[0],
            F.lit(" "),
            leads[1],
            F.lit(" "),
            leads[2],
            F.lit(" "),
            leads[3],
        ),
    )
    grams = tok.select("doc_id", "w", g5.alias("g5"))
    return (
        grams.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.expr(
                "CAST((count(*) - count(DISTINCT w)) * 1000000"
                " DIV count(*) AS BIGINT)"
            ).alias("dup_token_ppm"),
            F.expr(
                "CAST(CASE WHEN count(g5) > 0 THEN"
                " (count(g5) - count(DISTINCT g5)) * 1000000 DIV count(g5)"
                " ELSE 0 END AS BIGINT)"
            ).alias("dup5_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x352 — train/val/test split + cross-split near-dup leakage audit
# ---------------------------------------------------------------------------


def _split_oracle() -> str:
    from ravelytics_spark.plans.round19 import (
        _MH_JACCARD_MIN,
        _minhash_pair_ctes,
    )

    return f"""
WITH {_minhash_pair_ctes("documents")},
sp AS (
    SELECT doc_id,
           CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                          || ':split'), 1, 8)) AS BIGINT) % 100 < 80
                THEN 'train'
                WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                          || ':split'), 1, 8)) AS BIGINT) % 100 < 90
                THEN 'val' ELSE 'test' END AS split
    FROM documents
),
leak AS (
    SELECT CAST(count(*) AS BIGINT) AS leak_pairs
    FROM jac JOIN sp a ON jac.id_a = a.doc_id
             JOIN sp b ON jac.id_b = b.doc_id
    WHERE jac.j >= {_MH_JACCARD_MIN} AND a.split <> b.split
),
cnt AS (
    SELECT CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_train,
           CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_val,
           CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test
    FROM sp
)
SELECT cnt.n_train, cnt.n_val, cnt.n_test, leak.leak_pairs
FROM cnt, leak
"""


@_staged(
    "x352_split_leakage",
    "OP-X2/X-ext",
    "Train/val/test split + leakage audit in one certified result: "
    "membership is the deterministic md5-mod-100 split (80/10/10 — "
    "re-derivable from the key alone, the x99 property), and the "
    "leakage count is the number of near-duplicate pairs (x91's "
    "portable MinHash-LSH pipeline, Jaccard >= 0.35) that CROSS a "
    "split boundary — the eval-contamination failure mode that makes "
    "benchmark numbers lie (x19's decontamination is vs an external "
    "eval set; this audits the split itself). Plan: the x91 pair "
    "generator (bounded banded-LSH candidates, no N^2) + one "
    "broadcastable split map join + two scalar aggs. 100 TB: "
    "leakage cost is the near-dup pair count, not the corpus size; "
    "the split map is a pure expression, never materialized.",
    _split_oracle(),
)
def x352_split_leakage(spark, sf_dir):
    from ravelytics_spark.plans.round19 import portable_minhash_pairs

    d = load_table(spark, sf_dir, "documents")

    def split_col(idcol):
        h = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(idcol).cast("string"), F.lit(":split"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(100),
        )
        return (
            F.when(h < 80, F.lit("train"))
            .when(h < 90, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    # portable_minhash_pairs already thresholds on the RAW j (the
    # oracle's predicate); re-filtering on the rounded output column
    # here could diverge on a rounding boundary
    pairs = portable_minhash_pairs(spark, d)
    leak = pairs.select(
        split_col("id_a").alias("sa"), split_col("id_b").alias("sb")
    ).filter(F.col("sa") != F.col("sb")).agg(
        F.count("*").cast("long").alias("leak_pairs")
    )
    cnt = d.select(split_col("doc_id").alias("split")).agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("long")
        .alias("n_val"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
    )
    return cnt.crossJoin(F.broadcast(leak))


# --- round-12 registration footer (commented until round 12) ---
# These two lines register the whole batch into the live catalog; they
# must stay below the final @_staged definition so every entry is in
# STAGED before the update (the round-25 footer-placement lesson).
# from ravelytics_spark.plans.registry import REGISTRY as _REGISTRY
#
# _REGISTRY.update(STAGED)
