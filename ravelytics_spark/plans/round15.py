"""Round-15 catalog entries — the classic analytic patterns: grouped
top-k, period-over-period growth, cumulative distinct, gaps-and-
islands.

* **x73_topk_per_group** — top-3 orders per priority class by price:
  THE most common analytic request shape (rank window partitioned by
  the group, filter ≤ k). Distinct from w2 (which certifies rank
  itself) — this certifies the filtered composition users actually
  run.
* **x74_mom_growth** — month-over-month revenue growth: aggregate to
  the month grain FIRST (map-side-combined, decimal-exact), then lag
  over the tiny aggregated frame — the right order at 100 TB (a lag
  over raw rows would sort the corpus; over 80 month rows it is
  free).
* **x77_cumulative_distinct** — cumulative distinct customers by
  month. The naive form (COUNT(DISTINCT) OVER cumulative window) is
  quadratic state; the scale form used here is first-seen
  aggregation: min(month) per customer → new-customer count per month
  → running sum over the month spine. One shuffle per step, no
  distinct-in-window anywhere.
* **x78_order_streaks** — gaps-and-islands: consecutive-month
  ordering streaks per customer via the grouping-key =
  month_number − row_number identity (consecutive rows share it).
  Emits each customer's streaks with start/end/length.

Hash-parity conventions as plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import _dsum, _dsum_sql, q
from ravelytics_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# x73 — top-k per group
# ---------------------------------------------------------------------------

_TOPK_GRP_ORACLE = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders
)
WHERE rnk <= 3
ORDER BY o_orderpriority, rnk
"""


@q(
    "x73_topk_per_group",
    "OP-W1/O1-ext",
    "Top-3 orders per priority class by price: rank window partitioned "
    "on the group key (shuffle keyed on the group — parallel across "
    "groups, never SinglePartition), filter rnk <= k. At 100 TB with "
    "few groups + huge rows-per-group, the two-phase form (per-input-"
    "partition local top-k first, x48's shape) caps the shuffle; with "
    "many groups this direct window IS the scale shape.",
    _TOPK_GRP_ORACLE,
)
def x73_topk_per_group(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_orderpriority", "rnk")
    )


# ---------------------------------------------------------------------------
# x74 — month-over-month growth
# ---------------------------------------------------------------------------

_MOM_ORACLE = f"""
WITH monthly AS (
    SELECT strftime(o_orderdate, '%Y%m') AS month,
           {_dsum_sql("o_totalprice")} AS revenue
    FROM orders GROUP BY 1
)
SELECT month, revenue,
       round(revenue / lag(revenue) OVER (ORDER BY month) - 1, 6) AS mom_growth
FROM monthly ORDER BY month
"""


@q(
    "x74_mom_growth",
    "OP-W3-ext",
    "Month-over-month revenue growth: aggregate to the month grain "
    "FIRST (decimal-exact, map-side combined — the corpus-sized work), "
    "THEN lag over the ~80-row aggregated frame. The ordering window "
    "is global but over month-count rows — the deliberate inversion "
    "of w3's raw-row lag; doing the lag before the aggregate would "
    "sort the corpus. First month's growth is NULL (no prior).",
    _MOM_ORACLE,
)
def x74_mom_growth(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyyMM").alias("month")
    ).agg(_dsum("o_totalprice").alias("revenue"))
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        F.round(F.col("revenue") / F.lag("revenue").over(w) - 1, 6).alias(
            "mom_growth"
        ),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# x77 — cumulative distinct customers by month (first-seen aggregation)
# ---------------------------------------------------------------------------

_CUMDIST_ORACLE = """
WITH first_seen AS (
    SELECT o_custkey, min(strftime(o_orderdate, '%Y%m')) AS month
    FROM orders GROUP BY o_custkey
),
new_per_month AS (
    SELECT month, count(*) AS new_customers FROM first_seen GROUP BY month
),
months AS (SELECT DISTINCT strftime(o_orderdate, '%Y%m') AS month FROM orders)
SELECT months.month,
       CAST(COALESCE(new_per_month.new_customers, 0) AS BIGINT) AS new_customers,
       CAST(SUM(COALESCE(new_per_month.new_customers, 0))
            OVER (ORDER BY months.month) AS BIGINT) AS cumulative_customers
FROM months LEFT JOIN new_per_month USING (month)
ORDER BY months.month
"""


@q(
    "x77_cumulative_distinct",
    "OP-G5/W4-ext",
    "Cumulative distinct customers by month WITHOUT a distinct-in-"
    "window (whose state is quadratic at scale): min(month) per "
    "customer (one map-side-combined agg — a customer's first month "
    "is where they stop being new), new-customer counts per month, "
    "running sum over the month-count-sized frame. Every corpus-sized "
    "step is a plain hash-agg; the only window runs over ~80 rows.",
    _CUMDIST_ORACLE,
)
def x77_cumulative_distinct(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyyMM")
    first_seen = o.groupBy("o_custkey").agg(F.min(month).alias("month"))
    new_per_month = first_seen.groupBy("month").agg(
        F.count("*").alias("new_customers")
    )
    months = o.select(month.alias("month")).distinct()
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    joined = months.join(F.broadcast(new_per_month), "month", "left").select(
        "month", F.coalesce("new_customers", F.lit(0)).alias("new_customers")
    )
    return joined.select(
        "month",
        F.col("new_customers").cast("long").alias("new_customers"),
        F.sum("new_customers").over(w).cast("long").alias("cumulative_customers"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# x78 — gaps-and-islands: consecutive-month order streaks per customer
# ---------------------------------------------------------------------------

_STREAK_ORACLE = """
WITH cust_months AS (
    SELECT DISTINCT o_custkey,
           CAST(date_part('year', o_orderdate) * 12
                + date_part('month', o_orderdate) AS BIGINT) AS mnum
    FROM orders
),
grouped AS (
    SELECT o_custkey, mnum,
           mnum - row_number() OVER (PARTITION BY o_custkey ORDER BY mnum) AS grp
    FROM cust_months
)
SELECT o_custkey,
       CAST(min(mnum) AS BIGINT) AS streak_start,
       CAST(max(mnum) AS BIGINT) AS streak_end,
       CAST(count(*) AS BIGINT) AS streak_months
FROM grouped GROUP BY o_custkey, grp
HAVING count(*) >= 3
ORDER BY o_custkey, streak_start
"""


@q(
    "x78_order_streaks",
    "OP-W1-ext",
    "Gaps-and-islands: consecutive-month ordering streaks (>= 3 "
    "months) per customer via the classic month_number - row_number "
    "grouping key — consecutive months share it, a gap breaks it. "
    "The window partitions on the customer (group-keyed shuffle, "
    "bounded per-customer state), then one hash-agg per island. The "
    "retention/engagement primitive next to x37's fixed cohorts.",
    _STREAK_ORACLE,
)
def x78_order_streaks(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    mnum = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    cm = o.select("o_custkey", mnum.alias("mnum")).distinct()
    w = Window.partitionBy("o_custkey").orderBy("mnum")
    grouped = cm.withColumn("grp", F.col("mnum") - F.row_number().over(w))
    return (
        grouped.groupBy("o_custkey", "grp")
        .agg(
            F.min("mnum").cast("long").alias("streak_start"),
            F.max("mnum").cast("long").alias("streak_end"),
            F.count("*").cast("long").alias("streak_months"),
        )
        .filter(F.col("streak_months") >= 3)
        .drop("grp")
        .orderBy("o_custkey", "streak_start")
    )
