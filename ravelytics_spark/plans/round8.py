"""Round-8 catalog entries — scale-infrastructure operators.

Four operators a 100 TB training-data platform needs that no earlier
entry covers, each oracle-backed:

* **x40_dsir_weight** — DSIR-style importance weighting (Xie et al.
  2023, "Data Selection for Language Models via Importance
  Resampling"): score every raw document by the log-likelihood ratio
  of a target-domain unigram LM vs the raw-corpus unigram LM, the
  standard recipe for up-sampling target-like pre-training data.
* **x41_zorder_layout** — Z-order (Morton) clustering key: interleave
  the bits of two predicate columns so that file/bucket min-max ranges
  bound BOTH dimensions — the layout that makes multi-column data
  skipping work (Delta/Iceberg OPTIMIZE ZORDER analog, from first
  principles with pure bit arithmetic).
* **x42_bloom_prune_join** — bloom-filter semi-join reduction: build a
  compact bitset from the selective dim side and pre-filter the fact
  table BEFORE the join shuffle. The oracle is the plain join — result
  equality certifies the filter is semantics-preserving (no false
  drops), which is the property that makes the technique sound.
* **x43_pagerank** — fixed-iteration PageRank over a deterministically
  derived graph: the canonical iterative data-parallel algorithm
  (join–aggregate per round), oracle-backed via an unrolled-CTE DuckDB
  replica — complements the harness-only connected-components entry
  with a driver-certified iterative op.

Hash-parity conventions as plans/queries.py: decimal-exact sums, BIGINT
casts, total ORDER BY, ln() computed on identical IEEE doubles in both
engines (x20 precedent), final rounding where double summation order
could differ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import _dsum, _dsum_sql, q
from ravelytics_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# x40 — DSIR importance weighting (target-vs-raw unigram likelihood ratio)
# ---------------------------------------------------------------------------

_DSIR_ORACLE = """
WITH tok AS (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
    FROM documents
),
tok2 AS (SELECT doc_id, lang, w FROM tok WHERE w <> ''),
stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS R,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS T,
           CAST(count(DISTINCT w) AS DOUBLE) AS V
    FROM tok2
),
lm AS (
    SELECT w, CAST(count(*) AS DOUBLE) AS cr,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS ct
    FROM tok2 GROUP BY w
),
lp AS (
    SELECT w, ln(((ct + 1) / (T + V)) / ((cr + 1) / (R + V))) AS lp
    FROM lm CROSS JOIN stats
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(SUM(CAST(lp.lp AS DECIMAL(28,12))) AS DOUBLE), 6)
           AS dsir_logratio,
       CAST(CASE WHEN SUM(CAST(lp.lp AS DECIMAL(28,12))) > 0
                 THEN 1 ELSE 0 END AS BIGINT) AS selected
FROM tok2 t JOIN lp ON t.w = lp.w
GROUP BY t.doc_id ORDER BY t.doc_id
"""


@q(
    "x40_dsir_weight",
    "OP-X4-ext",
    "DSIR-style importance weight per document (Xie et al. 2023): "
    "log-likelihood ratio of a TARGET unigram LM (docs with lang='en' "
    "— the domain to up-sample) vs the RAW-corpus unigram LM, Laplace "
    "+1 smoothing over the raw vocabulary; selected = ratio > 0 "
    "(doc looks more target-like than corpus-average). At scale DSIR "
    "hashes n-grams into B buckets (xxhash64 % B) — word-keyed here so "
    "the DuckDB oracle replicates it exactly; the plan is identical "
    "either way. Shape: ONE token hash-agg builds both LMs (per-word "
    "raw + target counts in the same pass), the three global scalars "
    "(R, T, V) reduce map-side to one row per partition then "
    "broadcast, the tiny LM table broadcasts back onto the token "
    "stream, and the per-doc sum is decimal-exact (order-free). ln() "
    "runs once per VOCAB entry, not per token occurrence.",
    _DSIR_ORACLE,
)
def x40_dsir_weight(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    is_tgt = F.when(F.col("lang") == "en", 1).otherwise(0)
    stats = tok.agg(
        F.count("*").cast("double").alias("R"),
        F.sum(is_tgt).cast("double").alias("T"),
        F.countDistinct("w").cast("double").alias("V"),
    )
    lm = tok.groupBy("w").agg(
        F.count("*").cast("double").alias("cr"),
        F.sum(is_tgt).cast("double").alias("ct"),
    )
    # Division grouping written EXACTLY as in the oracle so both
    # engines execute the same IEEE operation sequence.
    ratio = ((F.col("ct") + 1) / (F.col("T") + F.col("V"))) / (
        (F.col("cr") + 1) / (F.col("R") + F.col("V"))
    )
    lp = lm.join(F.broadcast(stats)).select("w", F.log(ratio).alias("lp"))
    s = F.sum(F.col("lp").cast("decimal(28,12)"))
    return (
        tok.join(F.broadcast(lp), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(s.cast("double"), 6).alias("dsir_logratio"),
            F.when(s > 0, 1).otherwise(0).cast("long").alias("selected"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x41 — Z-order (Morton) clustering layout for multi-column data skipping
# ---------------------------------------------------------------------------

# Classic 16→32-bit bit-spread (insert a 0 between consecutive bits)
# via the standard magic-mask sequence — pure integer ops both engines
# evaluate identically.
_SPREAD_SQL = """
s{n} AS (
    SELECT *,
        (({v} | ({v} << 8)) & 16711935) AS a{n}
    FROM {src}
),
s{n}b AS (
    SELECT *, ((a{n} | (a{n} << 4)) & 252645135) AS b{n} FROM s{n}
),
s{n}c AS (
    SELECT *, ((b{n} | (b{n} << 2)) & 858993459) AS c{n} FROM s{n}b
),
s{n}d AS (
    SELECT *, ((c{n} | (c{n} << 1)) & 1431655765) AS d{n} FROM s{n}c
)
"""

_ZORDER_ORACLE = (
    "WITH base AS (\n"
    "    SELECT (o_custkey % 65536) AS x,\n"
    "           (datediff('day', DATE '1995-01-01',\n"
    "                     CAST(o_orderdate AS DATE)) % 65536) AS y\n"
    "    FROM orders\n"
    "),\n"
    + _SPREAD_SQL.format(n=1, v="x", src="base")
    + ",\n"
    + _SPREAD_SQL.format(n=2, v="y", src="s1d")
    + """,
z AS (SELECT x, y, (d1 | (d2 << 1)) AS zval FROM s2d)
SELECT (zval >> 16) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
       CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
FROM z GROUP BY 1 ORDER BY 1
"""
)


def _spread16(v: Column) -> Column:
    """Insert a zero bit between each of the low 16 bits (Morton spread)."""
    v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF))
    v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x33333333))
    v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x55555555))
    return v


def zorder_key(x: Column, y: Column) -> Column:
    """32-bit Morton code of two 16-bit values — the sort key that
    makes min-max pruning effective on BOTH columns at once."""
    return _spread16(x.cast("long")).bitwiseOR(
        F.shiftleft(_spread16(y.cast("long")), 1)
    )


@q(
    "x41_zorder_layout",
    "OP-S11-ext",
    "Z-order clustering layout: interleave the bits of the two "
    "hottest predicate columns (customer key, order-date day number) "
    "into a Morton code, bucket by its high bits, and report per-"
    "bucket min/max of BOTH dimensions — the file-level statistics a "
    "lakehouse OPTIMIZE ZORDER produces. Because the Morton curve is "
    "locality-preserving in both axes, every bucket bounds x AND y "
    "(a single-column sort bounds only one), so a predicate on either "
    "column prunes most buckets (asserted in tests). Pure bit "
    "arithmetic (magic-mask spread), zero UDFs; one map-side "
    "projection + one hash-agg. At 100 TB this key is the "
    "repartitionByRange/sortWithinPartitions sort key at write time; "
    "the agg here IS the stats collection pass.",
    _ZORDER_ORACLE,
)
def x41_zorder_layout(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        (F.col("o_custkey") % 65536).alias("x"),
        (
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
            % 65536
        ).alias("y"),
    )
    z = base.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("zval"))
    return (
        z.groupBy(F.shiftright(F.col("zval"), 16).alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("x").cast("long").alias("x_min"),
            F.max("x").cast("long").alias("x_max"),
            F.min("y").cast("long").alias("y_min"),
            F.max("y").cast("long").alias("y_max"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# x42 — bloom-filter semi-join reduction (certified semantics-preserving)
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 17  # bits
_H1_C = 2654435761  # Knuth multiplicative constant
_H2_C = 2246822519  # xxhash32 prime 2

_BLOOM_ORACLE = """
SELECT date_trunc('month', CAST(o.o_orderdate AS DATE)) AS mon,
       CAST(count(*) AS BIGINT) AS n_lines,
       {rev} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY 1 ORDER BY 1
""".format(rev=_dsum_sql("l.l_extendedprice * (1 - l.l_discount)"))


def _bloom_bits(key: Column) -> list[Column]:
    """Two bit positions per key: independent Knuth-style multiplicative
    hashes reduced mod m — pure BIGINT arithmetic, engine-portable."""
    k = key.cast("long")
    h1 = (k * _H1_C) % (1 << 32)
    h2 = (k * _H2_C) % (1 << 32)
    return [(h1 % _BLOOM_M).alias("b"), (h2 % _BLOOM_M).alias("b")]


@q(
    "x42_bloom_prune_join",
    "OP-J2-ext",
    "Bloom-filter semi-join reduction: the selective dim side (orders "
    "in a 3-month window, ~4% of keys) builds a 128 Kbit bloom filter "
    "(k=2 multiplicative hashes — portable integer math, here "
    "materialized as a distinct set-bit table, at most 2 rows per "
    "key), which broadcasts and pre-filters lineitem with two LEFT "
    "SEMI probes BEFORE the join — so the fact rows that shuffle are "
    "roughly the matching ~4% plus the bloom's false-positive rate "
    "(~0.2% at this fill), instead of 100%. The ORACLE IS THE PLAIN "
    "JOIN: result equality certifies the filter drops no true match — "
    "the soundness property that lets a 100 TB fact skip the shuffle. "
    "(Spark's AQE runtime bloom filter does this automatically for "
    "cost-picked joins; this entry makes the technique explicit and "
    "certified.)",
    _BLOOM_ORACLE,
)
def x42_bloom_prune_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    b1, b2 = _bloom_bits(F.col("o_orderkey"))
    bits = dim.select(F.explode(F.array(b1, b2)).alias("b")).distinct()
    p1, p2 = _bloom_bits(F.col("l_orderkey"))
    pruned = (
        li.withColumn("__b1", p1)
        .withColumn("__b2", p2)
        .join(F.broadcast(bits), F.col("__b1") == F.col("b"), "left_semi")
        .join(F.broadcast(bits), F.col("__b2") == F.col("b"), "left_semi")
    )
    rev = _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        pruned.join(
            F.broadcast(dim.select("o_orderkey", "o_orderdate")),
            pruned.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.date_trunc("month", F.to_date("o_orderdate")).cast("date").alias("mon"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            rev.alias("revenue"),
        )
        .orderBy("mon")
    )


# ---------------------------------------------------------------------------
# x43 — fixed-iteration PageRank (oracle-backed iterative algorithm)
# ---------------------------------------------------------------------------

_PR_N_MOD = 97
_PR_D = 0.85
_PR_ITERS = 3

_PR_EDGES_CTE = f"""
e AS (
    SELECT DISTINCT (o_custkey % {_PR_N_MOD}) AS src,
                    (o_orderkey % {_PR_N_MOD}) AS dst
    FROM orders
    WHERE o_orderkey % 11 < 2
      AND (o_custkey % {_PR_N_MOD}) <> (o_orderkey % {_PR_N_MOD})
),
nodes AS (
    SELECT DISTINCT v FROM (
        SELECT src AS v FROM e UNION SELECT dst FROM e
    )
),
ncnt AS (SELECT CAST(count(*) AS DOUBLE) AS N FROM nodes),
odeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src)
"""


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""
c_{out} AS (
    SELECT e.dst AS v,
           CAST(SUM(CAST(p.pr / odeg.deg AS DECIMAL(38,18))) AS DOUBLE) AS s
    FROM e JOIN odeg ON e.src = odeg.src JOIN {prev} p ON p.v = e.src
    GROUP BY e.dst
),
{out} AS (
    SELECT nodes.v,
           (1 - {_PR_D}) / N + {_PR_D} * coalesce(c_{out}.s, 0.0) AS pr
    FROM nodes CROSS JOIN ncnt LEFT JOIN c_{out} ON nodes.v = c_{out}.v
)
"""


_PAGERANK_ORACLE = (
    "WITH "
    + _PR_EDGES_CTE
    + ", p0 AS (SELECT v, 1.0 / N AS pr FROM nodes CROSS JOIN ncnt),"
    + ",".join(_pr_iter_sql(f"p{i}", f"p{i + 1}") for i in range(_PR_ITERS))
    + f"""
SELECT v AS node, round(pr, 9) AS pagerank
FROM p{_PR_ITERS} ORDER BY node
"""
)


@q(
    "x43_pagerank",
    "OP-X2-ext",
    f"Fixed-iteration PageRank (d={_PR_D}, {_PR_ITERS} iterations, no "
    "dangling-mass redistribution — a documented deterministic "
    "variant) over a graph derived with pure integer mod from orders "
    f"(nodes = keys mod {_PR_N_MOD}). THE oracle-backed iterative "
    "data-parallel algorithm: each round is one join (rank onto "
    "edges), one decimal-exact aggregate (contributions per dst — "
    "addition order free), one left join back to the node set; the "
    "DuckDB replica unrolls the same three rounds as CTEs, so every "
    "intermediate double is produced by the identical IEEE operation "
    "sequence in both engines. At 100 TB-scale graphs the rank table "
    "shuffle-joins edges partitioned by src with the same plan per "
    "round (plus localCheckpoint lineage truncation every few rounds, "
    "as operators/clusters.py does for connected components).",
    _PAGERANK_ORACLE,
)
def x43_pagerank(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    e = (
        o.filter(F.col("o_orderkey") % 11 < 2)
        .select(
            (F.col("o_custkey") % _PR_N_MOD).alias("src"),
            (F.col("o_orderkey") % _PR_N_MOD).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    ncnt = nodes.agg(F.count("*").cast("double").alias("N"))
    odeg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    ew = e.join(odeg, "src")
    pr = nodes.join(F.broadcast(ncnt)).select(
        "v", (F.lit(1.0) / F.col("N")).alias("pr")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            ew.join(pr.withColumnRenamed("v", "src"), "src")
            .select(
                F.col("dst").alias("v"),
                (F.col("pr") / F.col("deg")).cast("decimal(38,18)").alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").cast("double").alias("s"))
        )
        pr = (
            nodes.join(F.broadcast(ncnt))
            .join(contrib, "v", "left")
            .select(
                "v",
                (
                    (1 - _PR_D) / F.col("N")
                    + _PR_D * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr.select(
        F.col("v").alias("node"), F.round("pr", 9).alias("pagerank")
    ).orderBy("node")
