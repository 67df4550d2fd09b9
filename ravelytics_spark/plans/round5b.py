"""Round-5b — SQL-surface completeness shims.

Small but real dialect-surface entries a reference user would expect:

* **j6_null_safe_join** — null-safe equality join (Spark ``<=>`` /
  ANSI ``IS NOT DISTINCT FROM``): NULL keys MATCH each other instead
  of vanishing, the semantics ETL needs when joining on nullable
  degenerate dimensions.
* **x9b_unpivot** — unpivot/melt (the inverse of x9_pivot): wide
  measure columns → (measure, value) rows via Spark's native
  ``unpivot`` (STACK in SQL), DuckDB's UNPIVOT in the oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# j6 — null-safe equi-join
# ---------------------------------------------------------------------------

_NULLSAFE_ORACLE = """
WITH l AS (
    SELECT event_id,
           CASE WHEN value < 5.0 THEN NULL
                ELSE CAST(floor(value) AS BIGINT) END AS k
    FROM events WHERE event_id < 2000
),
r AS (
    SELECT CASE WHEN g < 5 THEN NULL ELSE g END AS k,
           concat('grp', CASE WHEN g < 5 THEN -1 ELSE g END) AS tag
    FROM (SELECT DISTINCT CAST(floor(value) AS BIGINT) AS g
          FROM events WHERE event_id < 2000) WHERE g IS NOT NULL
    GROUP BY 1, 2
)
SELECT l.event_id, l.k, r.tag
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
ORDER BY l.event_id, r.tag
"""


@q(
    "j6_null_safe_join",
    "OP-J2-ext",
    "Null-safe equality join (Spark `<=>` ≡ ANSI IS NOT DISTINCT "
    "FROM): NULL join keys MATCH each other instead of dropping — the "
    "semantics ETL needs for nullable degenerate dimensions. Catalyst "
    "plans `<=>` as an ordinary hash/sort-merge equi-join (EqualNullSafe "
    "is a join key, NOT a post-filter), so it shuffles and scales "
    "exactly like j2.",
    _NULLSAFE_ORACLE,
)
def j6_null_safe_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    l = ev.select(
        "event_id",
        F.when(F.col("value") < 5.0, F.lit(None).cast("long"))
        .otherwise(F.floor("value").cast("long"))
        .alias("k"),
    )
    g = (
        ev.select(F.floor("value").cast("long").alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    r = g.select(
        F.when(F.col("g") < 5, F.lit(None).cast("long"))
        .otherwise(F.col("g"))
        .alias("k"),
        F.concat(
            F.lit("grp"),
            F.when(F.col("g") < 5, F.lit(-1)).otherwise(F.col("g")),
        ).alias("tag"),
    ).distinct()
    return (
        l.join(r, l["k"].eqNullSafe(r["k"]))
        .select("event_id", l["k"].alias("k"), "tag")
        .orderBy("event_id", "tag")
    )


# ---------------------------------------------------------------------------
# x9b — unpivot / melt
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH wide AS (
    SELECT o_orderpriority AS prio,
           sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS f_cnt,
           sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS o_cnt,
           sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS p_cnt
    FROM orders GROUP BY o_orderpriority
)
SELECT prio, status, CAST(n AS BIGINT) AS n
FROM wide UNPIVOT (n FOR status IN (f_cnt, o_cnt, p_cnt))
ORDER BY prio, status
"""


@q(
    "x9b_unpivot",
    "OP-G-ext",
    "Unpivot/melt (inverse of x9_pivot): wide per-status count columns "
    "→ (status, n) rows via Spark's native unpivot (Expand node — "
    "map-side, no shuffle beyond the feeding agg). Round-trips the BI "
    "pivot surface both directions.",
    _UNPIVOT_ORACLE,
)
def x9b_unpivot(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy(F.col("o_orderpriority").alias("prio"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "prio",
            F.coalesce("F", F.lit(0)).alias("f_cnt"),
            F.coalesce("O", F.lit(0)).alias("o_cnt"),
            F.coalesce("P", F.lit(0)).alias("p_cnt"),
        )
    )
    return (
        wide.unpivot("prio", ["f_cnt", "o_cnt", "p_cnt"], "status", "n")
        .select("prio", "status", F.col("n").cast("long").alias("n"))
        .orderBy("prio", "status")
    )
