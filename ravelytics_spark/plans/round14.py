"""Round-14 catalog entries — SQL-surface completion: bag EXCEPT,
deterministic mode, decimal-exact correlation stats, calendar
dimension.

* **x8_except_all** — EXCEPT ALL bag semantics (the subtraction twin
  of x8_intersect_all; each occurrence cancels one occurrence).
* **x66_modal_priority** — per-group mode with a DETERMINISTIC
  tie-break: both engines' native ``mode()`` leaves ties undefined,
  so the modal value is computed as argmax over (count, value) —
  the same max(struct) idiom as g8's deterministic argmax.
* **x67_corr_stats** — Pearson correlation / covariance / stddev per
  group, computed FROM DECIMAL-EXACT MOMENT SUMS (n, Σx, Σy, Σxy,
  Σx², Σy²) rather than the engines' native corr()/covar aggregates:
  float moment accumulation is addition-order-dependent, exact
  decimal sums are not, and the closed-form combination is the same
  IEEE expression in both engines — the trick that makes second-order
  statistics hash-certifiable (x20/_dsum precedent, one order up).
* **x68_calendar_dim** — the generated calendar dimension (year,
  quarter, month, ISO week fields, weekend flag) spanning the orders
  date range — the date spine every BI join uses, derived relationally
  from min/max (xs1's spine idiom + the date-part surface).

Hash-parity conventions as plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# x8_except_all — bag subtraction
# ---------------------------------------------------------------------------


@q(
    "x8_except_all",
    "OP-SET",
    "EXCEPT ALL bag semantics: each right-side occurrence cancels ONE "
    "left occurrence (Spark exceptAll ≡ SQL EXCEPT ALL). Same "
    "row_number-pairing physical shape Catalyst plans for "
    "intersectAll — one shuffle per side on the value.",
    "SELECT nk FROM (SELECT c_nationkey AS nk FROM customer EXCEPT ALL "
    "SELECT s_nationkey FROM supplier) ORDER BY nk",
)
def x8_except_all(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.exceptAll(s).orderBy("nk")


# ---------------------------------------------------------------------------
# x66 — deterministic per-group mode
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
WITH counted AS (
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders GROUP BY o_orderstatus, o_orderpriority
),
best AS (
    SELECT o_orderstatus,
           max(struct_pack(n := n, pr := o_orderpriority)) AS b
    FROM counted GROUP BY o_orderstatus
)
SELECT o_orderstatus, b.pr AS modal_priority, CAST(b.n AS BIGINT) AS n
FROM best ORDER BY o_orderstatus
"""


@q(
    "x66_modal_priority",
    "OP-G-ext",
    "Per-group mode with a deterministic tie-break (largest value "
    "wins among equal counts): both engines' native mode() leaves "
    "ties undefined, so the modal value is an argmax over "
    "(count, value) via max(struct) — two map-side-combined "
    "aggregations, no window. The struct comparison is lexicographic "
    "(count first) in both engines.",
    _MODE_ORACLE,
)
def x66_modal_priority(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    return (
        counted.groupBy("o_orderstatus")
        .agg(F.max(F.struct("n", F.col("o_orderpriority").alias("pr"))).alias("b"))
        .select(
            "o_orderstatus",
            F.col("b.pr").alias("modal_priority"),
            F.col("b.n").cast("long").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# x67 — decimal-exact correlation / covariance / stddev per group
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
WITH m AS (
    SELECT l_returnflag,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS syy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       round((n * sxy - sx * sy) /
             (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
       round((n * sxy - sx * sy) / (n * n), 6) AS covar_pop,
       round(sqrt(n * sxx - sx * sx) / n, 6) AS stddev_pop_qty
FROM m ORDER BY l_returnflag
"""


@q(
    "x67_corr_stats",
    "OP-G6-ext",
    "Second-order statistics per group — Pearson correlation, "
    "population covariance, population stddev — from DECIMAL-EXACT "
    "moment sums (n, Σx, Σy, Σxy, Σx², Σy²) combined in closed form: "
    "native corr()/covar aggregates accumulate doubles in partition "
    "order (never hash-stable across engines); exact decimal moments "
    "are order-free and the closed-form combination is the identical "
    "IEEE expression on both sides. One map-side-combined aggregation "
    "— the moments ARE the mergeable state (the -State pattern for "
    "statistics).",
    _CORR_ORACLE,
)
def x67_corr_stats(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.sum(c.cast("decimal(28,6)")).cast("double")  # noqa: E731
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dec(x).alias("sx"),
        dec(y).alias("sy"),
        dec(x * y).alias("sxy"),
        dec(x * x).alias("sxx"),
        dec(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
        F.round((n * sxy - sx * sy) / (n * n), 6).alias("covar_pop"),
        F.round(F.sqrt(n * sxx - sx * sx) / n, 6).alias("stddev_pop_qty"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# x68 — generated calendar dimension over the orders date span
# ---------------------------------------------------------------------------

_CAL_ORACLE = """
WITH bounds AS (
    SELECT CAST(min(o_orderdate) AS DATE) AS d0,
           CAST(max(o_orderdate) AS DATE) AS d1
    FROM orders
),
days AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d FROM bounds
)
SELECT d AS cal_date,
       CAST(date_part('year', d) AS BIGINT) AS year,
       CAST(date_part('quarter', d) AS BIGINT) AS quarter,
       CAST(date_part('month', d) AS BIGINT) AS month,
       CAST(date_part('isoyear', d) AS BIGINT) AS iso_year,
       CAST(date_part('week', d) AS BIGINT) AS iso_week,
       CAST(date_part('isodow', d) AS BIGINT) AS iso_dow,
       CAST(date_part('isodow', d) IN (6, 7) AS BOOLEAN) AS is_weekend
FROM days ORDER BY cal_date
"""


@q(
    "x68_calendar_dim",
    "OP-D-ext",
    "Generated calendar dimension spanning the orders date range: "
    "year/quarter/month plus the ISO-8601 triple (iso_year, iso_week, "
    "iso_dow — the year can differ from the calendar year at "
    "boundaries, which is exactly what joins on 'week' get wrong "
    "without it) and a weekend flag. One min/max agg + sequence "
    "explode from the single bounds row; the dimension is "
    "date-range-sized, broadcastable forever.",
    _CAL_ORACLE,
)
def x68_calendar_dim(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    days = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
    )
    iso_dow = F.dayofweek(F.date_sub(F.col("d"), 1)).cast("long")  # Mon=1..Sun=7
    return days.select(
        F.col("d").alias("cal_date"),
        F.year("d").cast("long").alias("year"),
        F.quarter("d").cast("long").alias("quarter"),
        F.month("d").cast("long").alias("month"),
        F.expr("extract(yearofweek from d)").cast("long").alias("iso_year"),
        F.weekofyear("d").cast("long").alias("iso_week"),
        iso_dow.alias("iso_dow"),
        iso_dow.isin(6, 7).alias("is_weekend"),
    ).orderBy("cal_date")
