"""Round-2 catalog additions: remaining relational surface (FULL OUTER,
multi-distinct, grouping sets, TPC-H Q4/Q10/Q13/Q18 shapes) plus
training-data-pipeline operators (sliding event-time windows, L2 top-k,
int8 embedding quantization, bigram mining, normalization-based
near-exact dedup).

Every entry is oracle-backed (DuckDB SQL string) and registers behind
the round-1-era entries, so the driver's certification window picks up
the 37 previously-unverified oracles first and these next.

Hash-parity rules used throughout (see SURVEY §6): double sums via
exact DECIMAL accumulation (`_dsum`), one IEEE round at the end;
`floor(x + 0.5)` instead of round/cast-to-int where Spark (truncating
ANSI cast, HALF_UP round) and DuckDB (rounding cast) disagree;
timestamps grouped via F.window ≡ time_bucket (both midnight-aligned).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ravelytics_spark.functions import text as TX
from ravelytics_spark.plans.extensions import _LANGID_ORACLE, _PROBE, _PROBE_SQL
from ravelytics_spark.plans.registry import _dsum, _dsum_sql, q
from ravelytics_spark.sources.tables import load_table, load_tables

# ---------------------------------------------------------------------------
# Relational surface
# ---------------------------------------------------------------------------


@q(
    "j5_full_outer_join",
    "OP-J-ext",
    "FULL OUTER equi-join (the one join type §2.4 lacked): high-balance "
    "customers vs per-customer finished-1996 spend — unmatched rows "
    "survive on BOTH sides. Sort-merge full outer; the aggregate side "
    "is map-side-combined before the join shuffle, so at 100 TB the "
    "join moves one row per customer, not one per order.",
    "WITH hi AS (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 9000), "
    "sp AS (SELECT o_custkey, " + _dsum_sql("o_totalprice") + " AS spend_1996 FROM orders "
    "WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01' "
    "AND o_orderstatus = 'F' GROUP BY o_custkey) "
    "SELECT coalesce(hi.c_custkey, sp.o_custkey) AS cust_key, "
    "hi.c_name AS c_name, hi.c_acctbal AS c_acctbal, sp.spend_1996 AS spend_1996 "
    "FROM hi FULL OUTER JOIN sp ON hi.c_custkey = sp.o_custkey ORDER BY cust_key",
)
def j5_full_outer_join(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    hi = c.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_name", "c_acctbal")
    sp = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
            & (F.col("o_orderstatus") == "F")
        )
        .groupBy("o_custkey")
        .agg(_dsum("o_totalprice").alias("spend_1996"))
    )
    return (
        hi.join(sp, hi.c_custkey == sp.o_custkey, "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("cust_key"),
            "c_name",
            "c_acctbal",
            "spend_1996",
        )
        .orderBy("cust_key")
    )


@q(
    "g7_multi_count_distinct",
    "OP-G-ext",
    "Several COUNT(DISTINCT ...) in one aggregation (Expand-based "
    "multi-distinct rewrite — one pass over the input, no self-joins).",
    "SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, "
    "count(DISTINCT o_orderpriority) AS n_prio, count(*) AS n "
    "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
)
def g7_multi_count_distinct(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.countDistinct("o_orderpriority").alias("n_prio"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@q(
    "x14_grouping_sets",
    "OP-G-ext",
    "Arbitrary GROUPING SETS (beyond the x8_rollup / x12_cube lattices) "
    "with grouping_id disambiguation — one Expand, one hash-agg.",
    "SELECT coalesce(l_returnflag, '<all>') AS rflag, "
    "coalesce(l_linestatus, '<all>') AS lstatus, "
    "GROUPING(l_returnflag, l_linestatus) AS gid, count(*) AS n, "
    + _dsum_sql("l_quantity")
    + " AS sum_qty FROM lineitem "
    "GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ()) "
    # no-op on non-empty input; drops only the synthetic ()-set row SQL
    # emits over an EMPTY table, where Spark emits none (round-10 sweep)
    "HAVING count(*) > 0 "
    "ORDER BY gid, rflag, lstatus",
)
def x14_grouping_sets(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(
        "SELECT coalesce(l_returnflag, '<all>') AS rflag, "
        "coalesce(l_linestatus, '<all>') AS lstatus, "
        "grouping_id(l_returnflag, l_linestatus) AS gid, count(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty "
        "FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ()) "
        "ORDER BY gid, rflag, lstatus"
    )


# ---------------------------------------------------------------------------
# TPC-H shapes (adapted to the columns the testdata carries — lineitem
# has no commit/receipt dates, orders no comment)
# ---------------------------------------------------------------------------


@q(
    "tpch_q4_order_priority",
    "OP-J3/G3",
    "TPC-H Q4 shape: EXISTS-style decorrelated LEFT SEMI join (orders "
    "with a >30-days-late line item) + priority counts. Adapted "
    "predicate: l_shipdate > o_orderdate + 30 days stands in for the "
    "reference's commitdate < receiptdate (columns absent in testdata).",
    "SELECT o_orderpriority, count(*) AS n_late FROM orders "
    "WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01' "
    "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
    "AND l_shipdate > o_orderdate + INTERVAL 30 DAY) "
    "GROUP BY o_orderpriority ORDER BY o_orderpriority",
)
def tpch_q4_order_priority(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late"))
        .orderBy("o_orderpriority")
    )


@q(
    "tpch_q10_returned_items",
    "OP-J2/G3/O1",
    "TPC-H Q10: revenue lost to returned items per customer in a "
    "quarter, top 20. Fact-fact sort-merge join (orders x lineitem) "
    "with both filters pushed to the scans; nation broadcast; final "
    "top-k is TakeOrderedAndProject (per-partition heaps).",
    "SELECT c.c_custkey, c.c_name, " + _dsum_sql("l_extendedprice * (1 - l_discount)")
    + " AS revenue, c.c_acctbal, n.n_name "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-04-01' "
    "AND l.l_returnflag = 'R' "
    "GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name "
    "ORDER BY revenue DESC, c_custkey LIMIT 20",
)
def tpch_q10_returned_items(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@q(
    "tpch_q13_custdist",
    "OP-J1/G3",
    "TPC-H Q13 shape: order-count distribution — LEFT OUTER join with a "
    "predicate INSIDE the join condition (non-urgent orders only; "
    "customers keep a row even with zero matches), two stacked "
    "aggregations. Adapted predicate: o_orderpriority <> '1-URGENT' "
    "stands in for the reference's comment NOT LIKE filter.",
    "WITH per_cust AS (SELECT c.c_custkey, count(o.o_orderkey) AS c_count "
    "FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey "
    "AND o.o_orderpriority <> '1-URGENT' GROUP BY c.c_custkey) "
    "SELECT c_count, count(*) AS custdist FROM per_cust "
    "GROUP BY c_count ORDER BY custdist DESC, c_count DESC",
)
def tpch_q13_custdist(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@q(
    "tpch_q18_large_volume",
    "OP-J3/G3/O1",
    "TPC-H Q18: large-volume orders — HAVING-sum subquery as a LEFT "
    "SEMI join against the aggregated keys (the aggregate shrinks to "
    "one row per order key before any join; only qualifying keys "
    "shuffle into the semi join). Threshold 220 tuned non-empty at "
    "sf0.01.",
    "WITH big AS (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey "
    "HAVING sum(l_quantity) > 220) "
    "SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, "
    "o.o_totalprice, " + _dsum_sql("l.l_quantity") + " AS total_qty "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
    "WHERE o.o_orderkey IN (SELECT l_orderkey FROM big) "
    "GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice "
    "ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100",
)
def tpch_q18_large_volume(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 220)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Event-time: sliding windows (the overlap generalization of
# t_window_daily's tumbling form)
# ---------------------------------------------------------------------------


@q(
    "w8_sliding_window",
    "OP-T-ext",
    "Sliding event-time windows (2-day width, 1-day slide): each event "
    "lands in exactly width/slide = 2 windows. F.window's multi-assign "
    "≡ a UNION ALL of shifted time_buckets in the oracle. Same "
    "hash-agg shape as tumbling — the expand factor (2x rows into the "
    "partial agg, map-side combined) is the entire extra cost at scale.",
    "WITH w AS ("
    "SELECT time_bucket(INTERVAL '1 day', ts) AS win_start, value FROM events "
    "UNION ALL "
    "SELECT time_bucket(INTERVAL '1 day', ts) - INTERVAL '1 day' AS win_start, value "
    "FROM events) "
    "SELECT win_start, count(*) AS n, " + _dsum_sql("value") + " AS sum_value "
    "FROM w GROUP BY win_start ORDER BY win_start",
)
def w8_sliding_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("win"))
        .agg(F.count("*").alias("n"), _dsum("value").alias("sum_value"))
        .select(F.col("win.start").alias("win_start"), "n", "sum_value")
        .orderBy("win_start")
    )


# ---------------------------------------------------------------------------
# Embedding ops: L2 top-k, int8 quantization error
# ---------------------------------------------------------------------------

_L2_ORACLE = f"""
WITH p AS (
    SELECT generate_subscripts(a, 1) AS dim, CAST(unnest(a) AS DOUBLE) AS px
    FROM (SELECT {_PROBE_SQL}::DOUBLE[] AS a)
),
ex AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
)
SELECT vec_id,
       round(sqrt(CAST(SUM(CAST((x - px) * (x - px) AS DECIMAL(28,12))) AS DOUBLE)), 4)
           AS l2_dist
FROM ex JOIN p USING (dim)
GROUP BY vec_id ORDER BY l2_dist, vec_id LIMIT 10
"""


@q(
    "x3_l2_topk",
    "OP-X3",
    "Exact L2-distance top-k to a probe vector: posexplode → dim-join "
    "against the broadcast probe → decimal-accumulated squared error "
    "(addition-order-proof) → one sqrt → TakeOrderedAndProject. "
    "Map-only + per-partition heaps; zero wide shuffles (the groupBy "
    "key is the posexplode parent, satisfied within partitions at "
    "scale via partial agg).",
    _L2_ORACLE,
)
def x3_l2_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    probe = F.array(*[F.lit(float(x)) for x in _PROBE])
    ex = e.select(
        "vec_id",
        F.posexplode("embedding").alias("dim0", "xf"),
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
        F.element_at(probe, F.col("dim0") + 1).cast("double").alias("px"),
    )
    d2 = (F.col("x") - F.col("px")) * (F.col("x") - F.col("px"))
    return (
        ex.groupBy("vec_id")
        .agg(F.round(F.sqrt(F.sum(d2.cast("decimal(28,12)")).cast("double")), 4).alias("l2_dist"))
        .orderBy("l2_dist", "vec_id")
        .limit(10)
    )


_QUANT_ORACLE = """
WITH ex AS (
    SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
),
s AS (
    SELECT vec_id, max(abs(x)) / 127.0 AS scale FROM ex GROUP BY vec_id
),
e AS (
    SELECT ex.vec_id, s.scale,
           x - floor(x / s.scale + 0.5) * s.scale AS err
    FROM ex JOIN s ON ex.vec_id = s.vec_id WHERE s.scale > 0
)
SELECT vec_id, round(scale, 8) AS scale,
       round(CAST(SUM(CAST(err * err AS DECIMAL(38,18))) AS DOUBLE) / 64.0, 10) AS mse
FROM e GROUP BY vec_id, scale ORDER BY vec_id
"""


@q(
    "x15_quantize_int8",
    "OP-X3-ext",
    "Symmetric int8 embedding quantization with per-vector scale "
    "(max|x|/127) and reconstruction MSE — the storage/ANN-speed lever "
    "for 100 TB embedding corpora. Quantizer spelled floor(x/s + 0.5) "
    "on BOTH engines (Spark's double->int cast truncates, DuckDB's "
    "rounds — floor+0.5 is the portable round-half-up). Two passes "
    "over exploded dims sharing one exchange (scale, then error), "
    "decimal-accumulated MSE.",
    _QUANT_ORACLE,
)
def x15_quantize_int8(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    ex = (
        e.select("vec_id", F.explode("embedding").alias("xf"))
        .select("vec_id", F.col("xf").cast("double").alias("x"))
        .repartition("vec_id")
    )
    s = ex.groupBy("vec_id").agg((F.max(F.abs(F.col("x"))) / 127.0).alias("scale"))
    err = (
        ex.join(s, "vec_id")
        .filter(F.col("scale") > 0)
        .select(
            "vec_id",
            "scale",
            (
                F.col("x")
                - F.floor(F.col("x") / F.col("scale") + 0.5) * F.col("scale")
            ).alias("err"),
        )
    )
    return (
        err.groupBy("vec_id", "scale")
        .agg(
            F.round(
                F.sum((F.col("err") * F.col("err")).cast("decimal(38,18)")).cast("double")
                / 64.0,
                10,
            ).alias("mse")
        )
        .select("vec_id", F.round("scale", 8).alias("scale"), "mse")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Text: bigram mining, normalization-based near-exact dedup
# ---------------------------------------------------------------------------


@q(
    "x16_bigram_topk",
    "OP-X4",
    "Corpus-level word-bigram frequencies, top 40. Adjacent pairs are "
    "formed WITHOUT a per-doc window or self-join: zip the token array "
    "with its own tail (arrays_zip + slice — native codegen "
    "expressions, no interpreted lambda), explode, concat. One "
    "shuffle total (the map-side-combined count agg); the window-lag "
    "alternative would shuffle every token row by doc first.",
    "WITH tok AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), "
    "w -> w <> '') AS ws FROM documents), "
    "t AS (SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos FROM tok) "
    "SELECT a.w || ' ' || b.w AS bigram, count(*) AS c "
    "FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
    "GROUP BY bigram ORDER BY c DESC, bigram LIMIT 40",
)
def x16_bigram_topk(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    t = d.select(ws.alias("ws")).filter(F.size("ws") > 1)
    zipped = t.select(
        F.arrays_zip(
            F.slice("ws", 1, F.size("ws") - 1).alias("a"),
            F.slice("ws", 2, F.size("ws") - 1).alias("b"),
        ).alias("z")
    )
    return (
        zipped.select(F.explode("z").alias("p"))
        .select(F.concat_ws(" ", F.col("p.a"), F.col("p.b")).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "bigram")
        .limit(40)
    )


_CHUNK_SIZE = 64  # tokens per training chunk
_CHUNK_STEP = 48  # stride (= size - 16-token overlap)

_CHUNK_ORACLE = f"""
WITH tok AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ws
    FROM documents
),
sized AS (
    SELECT doc_id, ws, len(ws) AS n,
           CASE WHEN len(ws) <= {_CHUNK_SIZE} THEN 1
                ELSE (len(ws) - {_CHUNK_SIZE} + {_CHUNK_STEP} - 1) // {_CHUNK_STEP} + 1
           END AS n_chunks
    FROM tok WHERE len(ws) > 0
)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
       CAST(len(ws[k * {_CHUNK_STEP} + 1 : k * {_CHUNK_STEP} + {_CHUNK_SIZE}]) AS BIGINT)
           AS n_tokens,
       array_to_string(ws[k * {_CHUNK_STEP} + 1 : k * {_CHUNK_STEP} + {_CHUNK_SIZE}], ' ')
           AS chunk_text
FROM sized, unnest(range(n_chunks)) AS t(k)
ORDER BY doc_id, chunk_id
"""


@q(
    "x17_chunk_tokens",
    "OP-X4/X1-ext",
    "Sliding-window token chunking for training-data prep: 64-token "
    "chunks, 48-token stride (16-token overlap); the final chunk may "
    "run short but always carries >16 tokens beyond its predecessor "
    "(no chunk is fully contained in another). "
    "Map-only: tokenize once, sequence+posexplode the chunk index, "
    "slice the token array — no shuffle at all until a downstream "
    "consumer aggregates; chunk count is pure integer arithmetic "
    "spelled identically on both engines (floor division).",
    _CHUNK_ORACLE,
)
def x17_chunk_tokens(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    sized = (
        d.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") > 0)
        .select(
            "doc_id",
            "ws",
            F.when(F.size("ws") <= _CHUNK_SIZE, F.lit(1))
            .otherwise(
                F.floor(
                    (F.size("ws") - _CHUNK_SIZE + _CHUNK_STEP - 1) / _CHUNK_STEP
                ).cast("int")
                + 1
            )
            .alias("n_chunks"),
        )
    )
    chunks = sized.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("_p", "k"),
        "ws",
    ).select(
        "doc_id",
        F.col("k").cast("long").alias("chunk_id"),
        F.slice(
            "ws", F.col("k") * _CHUNK_STEP + 1, F.lit(_CHUNK_SIZE)
        ).alias("chunk_ws"),
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size("chunk_ws").cast("long").alias("n_tokens"),
        F.array_join("chunk_ws", " ").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


@q(
    "x1c_dedup_normalized",
    "OP-X1/X4",
    "Near-exact dedup after text normalization (lowercase, strip "
    "punctuation, collapse whitespace) — the C4/RefinedWeb-style "
    "canonical-form dedup between exact and fuzzy. Same keep-min-id "
    "hash-agg shape as x1: one shuffle of (normalized-hash, id), "
    "documents themselves never move.",
    "WITH n AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g')) AS norm FROM documents) "
    "SELECT norm, min(doc_id) AS keep_id, count(*) AS n_dups "
    "FROM n WHERE norm <> '' GROUP BY norm ORDER BY keep_id",
)
def x1c_dedup_normalized(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), r"\s+", " "
        )
    )
    return (
        d.select("doc_id", norm.alias("norm"))
        .filter(F.col("norm") != "")
        .groupBy("norm")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
        .orderBy("keep_id")
    )


@q(
    "tpch_q14_promo_revenue",
    "OP-J2/G5",
    "TPC-H Q14: promo revenue share in a month — lineitem x part equi-"
    "join (part broadcast: a dim by row count even at 100 TB fact "
    "scale), conditional revenue split, ONE global ratio. Both sums "
    "accumulate in exact DECIMAL; the single divide is the only IEEE "
    "op, so the ratio is hash-stable.",
    "SELECT round(100.0 * "
    "CAST(SUM(CASE WHEN p_type = 'PROMO' "
    "THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)) "
    "ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) / "
    + _dsum_sql("l_extendedprice * (1 - l_discount)")
    + ", 6) AS promo_pct "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'",
)
def tpch_q14_promo_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)")
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(28,4)")
    )
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            100.0 * F.sum(promo_rev).cast("double") / F.sum(rev).cast("double"), 6
        ).alias("promo_pct")
    )


_LANGID_CONFUSION_ORACLE = (
    "WITH pred AS (" + _LANGID_ORACLE.replace("ORDER BY doc_id", "") + ") "
    "SELECT d.lang AS lang_true, pred.lang_pred AS lang_pred, count(*) AS n "
    "FROM documents d JOIN pred ON d.doc_id = pred.doc_id "
    "GROUP BY lang_true, lang_pred ORDER BY lang_true, lang_pred"
)


@q(
    "x4_langid_confusion",
    "OP-X4",
    "Language-ID evaluation: confusion matrix of labeled lang vs "
    "marker-based prediction (the quality-monitoring loop a curation "
    "pipeline runs per batch). Prediction is computed once per doc "
    "(explode + codegen agg — no interpreted HOF in the hot path), "
    "then a 25-cell aggregate.",
    _LANGID_CONFUSION_ORACLE,
)
def x4_langid_confusion(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    pred = TX.lang_id_agg(d, "doc_id", "text").join(
        d.select("doc_id", "lang"), "doc_id"
    )
    return (
        pred.groupBy(F.col("lang").alias("lang_true"), "lang_pred")
        .agg(F.count("*").alias("n"))
        .orderBy("lang_true", "lang_pred")
    )


@q(
    "x4_source_stats",
    "OP-X4/G3",
    "Per-source corpus accounting (docs, chars, tokens, languages) — "
    "the shape of a per-crawl/per-dump quality dashboard. Token "
    "counting via explode + count (codegen, map-side combined) joined "
    "to the doc-level aggregate on the source key; both aggregations "
    "shuffle only (source, counters) rows.",
    "WITH tok AS (SELECT source, CAST(SUM(len(list_filter("
    "string_split_regex(text, '\\s+'), w -> w <> ''))) AS BIGINT) AS n_tokens "
    "FROM documents GROUP BY source), "
    "doc AS (SELECT source, count(*) AS n_docs, "
    "CAST(SUM(n_chars) AS BIGINT) AS total_chars, "
    "count(DISTINCT lang) AS n_langs FROM documents GROUP BY source) "
    "SELECT doc.source, n_docs, total_chars, n_tokens, n_langs "
    "FROM doc JOIN tok ON doc.source = tok.source ORDER BY doc.source",
)
def x4_source_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("__w")
    ).filter(F.col("__w") != "")
    tok = words.groupBy("source").agg(F.count("*").alias("n_tokens"))
    doc = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    return (
        doc.join(tok, "source")
        .select("source", "n_docs", "total_chars", "n_tokens", "n_langs")
        .orderBy("source")
    )


@q(
    "tpch_q15_top_supplier",
    "OP-J2/G3/ext",
    "TPC-H Q15: supplier(s) with maximum quarterly revenue — the "
    "scalar-subquery max re-expressed as a broadcast 1-row join (the "
    "aggregate shrinks map-side to one row per supplier BEFORE any "
    "join; the global max is one broadcast row; ties all survive). "
    "Revenue equality is tested on the exact DECIMAL accumulation, "
    "never on IEEE doubles — doubles only appear in the output cast.",
    "WITH rev AS (SELECT l_suppkey, "
    "SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS total "
    "FROM lineitem WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01' "
    "GROUP BY l_suppkey) "
    "SELECT s.s_suppkey, s.s_name, CAST(rev.total AS DOUBLE) AS total_revenue "
    "FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey "
    "WHERE rev.total = (SELECT max(total) FROM rev) "
    "ORDER BY s.s_suppkey",
)
def tpch_q15_top_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)")
        ).alias("total")
    )
    top = rev.agg(F.max("total").alias("__mx"))
    winners = rev.join(F.broadcast(top), rev.total == F.col("__mx")).select(
        "l_suppkey", "total"
    )
    return (
        s.join(winners, s.s_suppkey == F.col("l_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


_PACK_BUDGET = 256  # tokens per training sequence (pack)
_PACK_BUCKETS = 8


@q(
    "x18_sequence_packing",
    "OP-X4/X1-ext",
    "Sequence packing for training: assign docs to fixed-budget "
    "(256-token) packs, greedily in doc order WITHIN hash buckets — "
    "the distributed form of concat-and-pack. The running-sum window "
    "partitions on the bucket (parallel, bounded state), never "
    "globally; pack identity is (bucket, floor(preceding-tokens / "
    "budget)), pure integer arithmetic on both engines.",
    f"""
WITH tok AS (
    SELECT doc_id, doc_id % {_PACK_BUCKETS} AS bucket,
           len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_tok
    FROM documents
    WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0
),
packed AS (
    SELECT bucket, doc_id, n_tok,
           CAST(floor((SUM(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
                / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
    FROM tok
)
SELECT bucket, pack_id, count(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
FROM packed GROUP BY bucket, pack_id ORDER BY bucket, pack_id
""",
)
def x18_sequence_packing(spark, sf_dir):
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    clean = F.trim(F.regexp_replace("text", r"\s+", " "))
    tok = d.select(
        "doc_id",
        (F.col("doc_id") % _PACK_BUCKETS).alias("bucket"),
        F.size(F.split(clean, " ")).alias("n_tok"),
        clean.alias("__c"),
    ).filter(F.length("__c") > 0)
    w = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    packed = tok.select(
        "bucket",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / float(_PACK_BUDGET))
        .cast("long")
        .alias("pack_id"),
    )
    return (
        packed.groupBy("bucket", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("pack_tokens"),
        )
        .orderBy("bucket", "pack_id")
    )


_DECON_N = 4  # screen width: 4-grams (synthetic vocab is small;
# real benchmark decontamination uses 8-13-gram windows — the
# plan is width-independent)


@q(
    "x19_decontamination",
    "OP-X2/X4-ext",
    "Benchmark-decontamination screen: flag corpus documents sharing "
    "any n-gram (width 4 here; 8-13 in production) with a held-out probe set (here: doc_id % 100 == 0 "
    "stands in for the benchmark). N-grams form map-side (sequence + "
    "posexplode + slice — no lambda, no per-doc window); the probe "
    "gram set aggregates to DISTINCT before the join, so the join "
    "input is small and broadcastable at real benchmark sizes.",
    f"""
WITH tok AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
    FROM documents
    WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0
),
grams AS (
    SELECT doc_id, array_to_string(ws[k + 1 : k + {_DECON_N}], ' ') AS gram
    FROM tok, unnest(range(greatest(len(ws) - {_DECON_N} + 1, 0))) AS t(k)
),
probe AS (
    SELECT DISTINCT gram FROM grams WHERE doc_id % 100 = 0
)
SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared_grams
FROM grams g JOIN probe ON g.gram = probe.gram
WHERE g.doc_id % 100 <> 0
GROUP BY g.doc_id ORDER BY g.doc_id
""",
)
def x19_decontamination(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    clean = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    raw = F.trim(F.regexp_replace("text", r"\s+", " "))
    tok = d.select("doc_id", F.split(clean, " ").alias("ws")).filter(
        F.length(raw) > 0
    )
    grams = tok.select(
        "doc_id",
        F.posexplode(
            F.sequence(
                F.lit(0), F.greatest(F.size("ws") - _DECON_N, F.lit(0))
            )
        ).alias("_p", "k"),
        "ws",
    ).filter(
        F.col("k") <= F.size("ws") - _DECON_N
    ).select(
        "doc_id",
        F.array_join(F.slice("ws", F.col("k") + 1, _DECON_N), " ").alias("gram"),
    )
    probe = grams.filter(F.col("doc_id") % 100 == 0).select("gram").distinct()
    return (
        grams.filter(F.col("doc_id") % 100 != 0)
        .join(probe, "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
        .orderBy("doc_id")
    )
