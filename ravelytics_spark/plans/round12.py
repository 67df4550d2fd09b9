"""Round-12 catalog entries — skew-safe aggregation certification,
robust outlier detection, oracle-backed connected components.

* **x33_salted_agg** — the two-phase salted aggregation
  (operators/skew.salted_agg) certified against the plain GROUP BY:
  result equality proves the salt/combine decomposition is exact for
  the decomposable aggregates (count, sum) — the property that makes
  the skew mitigation safe to drop into any hot-key aggregation.
  (Fills the x33 slot next to x32_salted_join, which certifies the
  join-side technique.)
* **x57_mad_outliers** — modified z-score outliers (Iglewicz–Hoaglin,
  public statistics): per-source median and MAD (median absolute
  deviation), flag |0.6745·(x−m)/MAD| > 3.5. The robust form of
  outlier detection — mean/std (x11's z-score) is itself dragged by
  the outliers it is meant to find.
* **x58_connected_components** — fixed-iteration min-label
  propagation over the derived order graph (undirected), the
  data-parallel connected-components kernel, oracle-backed by
  unrolling the same rounds as DuckDB CTEs (the x43_pagerank
  precedent for certifying iterative algorithms). A pytest asserts
  the iteration count reaches a fixed point at sf0.01, so the
  certified output IS the true components, not a truncation.

Hash-parity conventions as plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# x33 — salted (two-phase) aggregation == plain aggregation
# ---------------------------------------------------------------------------

_SALTED_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@q(
    "x33_salted_agg",
    "OP-G3-ext",
    "Two-phase salted aggregation (operators/skew.salted_agg): rows "
    "of a hot key spread across salt buckets, partial aggregates per "
    "(key, salt), then combined per key — two small shuffles instead "
    "of one skewed one. The oracle is the PLAIN group-by; the hash "
    "match certifies the decomposition (count→sum, sum→sum, max→max) "
    "is exact, which is what makes the mitigation safe under real "
    "skew. Decimal-exact quantity sums keep the double cast "
    "order-free.",
    _SALTED_ORACLE,
)
def x33_salted_agg(spark, sf_dir):
    from ravelytics_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "n_rows": (F.count("*"), F.sum("n_rows")),
            "sum_qty": (
                F.sum(F.col("l_quantity").cast("decimal(28,4)")),
                F.sum("sum_qty"),
            ),
            "max_qty": (F.max("l_quantity"), F.max("max_qty")),
        },
        buckets=16,
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("max_qty").cast("double").alias("max_qty"),
    ).orderBy("l_returnflag", "l_linestatus")


# ---------------------------------------------------------------------------
# x57 — modified z-score (median/MAD) outliers per source
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
    SELECT source, quantile_cont(n_chars, 0.5) AS m
    FROM documents GROUP BY source
),
mad AS (
    SELECT d.source, ANY_VALUE(med.m) AS m,
           quantile_cont(abs(d.n_chars - med.m), 0.5) AS mad
    FROM documents d JOIN med USING (source)
    GROUP BY d.source
)
SELECT d.doc_id, d.source, d.n_chars,
       round(0.6745 * (d.n_chars - mad.m) / mad.mad, 6) AS robust_z
FROM documents d JOIN mad USING (source)
WHERE mad.mad > 0
  AND abs(0.6745 * (d.n_chars - mad.m) / mad.mad) > 3.5
ORDER BY d.doc_id
"""


@q(
    "x57_mad_outliers",
    "OP-X4-ext",
    "Robust outlier detection per source: modified z-score "
    "0.6745*(x-median)/MAD with the standard 3.5 threshold "
    "(Iglewicz–Hoaglin) — median/MAD resist the very outliers that "
    "drag mean/std (x11's z-score). Two grouped exact-percentile "
    "aggs (the second over |x-median| after broadcasting the "
    "source-count-sized median table), then one broadcast filter "
    "pass over the scan; at 100 TB both medians swap to "
    "approx_percentile with the same plan shape. Parity: both "
    "engines interpolate quantiles at rank (n-1)*q on identical "
    "inputs, and the z expression is pure IEEE on identical doubles.",
    _MAD_ORACLE,
)
def x57_mad_outliers(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    med = d.groupBy("source").agg(F.percentile("n_chars", F.lit(0.5)).alias("m"))
    mad = (
        d.join(F.broadcast(med), "source")
        .groupBy("source")
        .agg(
            F.first("m").alias("m"),
            F.percentile(F.abs(F.col("n_chars") - F.col("m")), F.lit(0.5)).alias(
                "mad"
            ),
        )
    )
    z = F.lit(0.6745) * (F.col("n_chars") - F.col("m")) / F.col("mad")
    return (
        d.join(F.broadcast(mad), "source")
        .filter((F.col("mad") > 0) & (F.abs(z) > 3.5))
        .select("doc_id", "source", "n_chars", F.round(z, 6).alias("robust_z"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x58 — connected components (fixed-iteration min-label propagation)
# ---------------------------------------------------------------------------

_CC_N_MOD = 2000
_CC_ITERS = 6


def _cc_round_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
    SELECT n.node,
           LEAST(n.label, COALESCE(m.minl, n.label)) AS label
    FROM {prev} n
    LEFT JOIN (
        SELECT ue.dst AS node, MIN(p.label) AS minl
        FROM uedges ue JOIN {prev} p ON ue.src = p.node
        GROUP BY ue.dst
    ) m USING (node)
)"""


_CC_ORACLE = (
    f"""
WITH edges AS (
    SELECT DISTINCT (o_custkey % {_CC_N_MOD}) AS src,
                    (o_orderkey % {_CC_N_MOD}) AS dst
    FROM orders
    WHERE (o_orderkey % 29) < 1 AND (o_custkey % {_CC_N_MOD}) <> (o_orderkey % {_CC_N_MOD})
),
uedges AS (
    SELECT src, dst FROM edges
    UNION
    SELECT dst AS src, src AS dst FROM edges
),
nodes AS (SELECT DISTINCT src AS node FROM uedges),
lab0 AS (SELECT node, node AS label FROM nodes),
"""
    + ",".join(_cc_round_sql(f"lab{i}", f"lab{i + 1}") for i in range(_CC_ITERS))
    + f"""
SELECT node, label AS component FROM lab{_CC_ITERS} ORDER BY node
"""
)


@q(
    "x58_connected_components",
    "OP-X2-ext",
    f"Connected components via {_CC_ITERS}-round min-label propagation "
    "over the derived undirected order graph: per round, one "
    "join (labels onto edges), one min-aggregate per neighbor, one "
    "left join back — the data-parallel CC kernel "
    "(operators/clusters.py runs the same loop with localCheckpoint "
    "lineage truncation for unbounded rounds; this fixed-round form "
    "is the certifiable one, and tests assert the round count reaches "
    "a fixed point at sf0.01, so the certified output is the true "
    "component labeling). Oracle: the identical rounds unrolled as "
    "DuckDB CTEs (x43_pagerank precedent). All label math is integer "
    "min — no float drift possible.",
    _CC_ORACLE,
)
def x58_connected_components(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    edges = (
        o.filter(F.col("o_orderkey") % 29 < 1)
        .select(
            (F.col("o_custkey") % _CC_N_MOD).alias("src"),
            (F.col("o_orderkey") % _CC_N_MOD).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    uedges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = uedges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_CC_ITERS):
        nbr_min = (
            uedges.join(labels, uedges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("label").alias("minl"))
        )
        labels = labels.join(
            nbr_min, labels.node == nbr_min.node2, "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("minl"), F.col("label"))
            ).alias("label"),
        )
    return labels.select("node", F.col("label").alias("component")).orderBy("node")
