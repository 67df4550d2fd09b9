"""Round-16 catalog entries — warehouse introspection.

* **x79_column_profile** — the ANALYZE-style per-column profile of a
  table (orders): nulls, distincts, min/max rendered to strings, for
  every column in one result — what a warehouse keeps as table
  statistics and what a data-quality dashboard reads. One aggregation
  computes every column's stats in a single scan (no per-column
  passes); the per-column rows are unpivoted from that one row.
  Complements xq_validation_report (rule-based pass/fail) with the
  raw statistical surface.

Hash-parity conventions as plans/queries.py; min/max rendered via
identical casts on both sides, doubles through round(…, 2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table

_PROFILE_COLS = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "varchar"),
    ("o_totalprice", "double"),
    ("o_orderpriority", "varchar"),
]


def _render_sql(col: str, typ: str) -> tuple[str, str]:
    if typ == "double":
        return (f"CAST(round(min({col}), 2) AS VARCHAR)",
                f"CAST(round(max({col}), 2) AS VARCHAR)")
    return f"CAST(min({col}) AS VARCHAR)", f"CAST(max({col}) AS VARCHAR)"


_PROFILE_ORACLE = (
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        "SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
        "CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        "{mn} AS min_value, {mx} AS max_value FROM orders".format(
            c=c, mn=_render_sql(c, t)[0], mx=_render_sql(c, t)[1]
        )
        for c, t in _PROFILE_COLS
    )
    + "\n) ORDER BY column_name"
)


@q(
    "x79_column_profile",
    "OP-G5/G6-ext",
    "ANALYZE-style column profile of orders — rows, nulls, distincts, "
    "min/max per column — in ONE scan: a single aggregation computes "
    "every column's statistics side by side (count/count(col)/"
    "count distinct/min/max are all partial-aggregatable, so the scan "
    "cost is one pass regardless of column count; the oracle's "
    "UNION-ALL-per-column spelling is the semantic reference, not the "
    "plan), then the stats row unpivots to per-column rows. The "
    "statistics surface a warehouse keeps per table and a quality "
    "dashboard reads; xq_validation_report is the rule-based layer "
    "above it.",
    _PROFILE_ORACLE,
)
def x79_column_profile(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")

    def render(c: str, typ: str, agg: str) -> F.Column:
        base = F.col(c)
        if typ == "double":
            expr = F.round(F.min(base) if agg == "min" else F.max(base), 2)
        else:
            expr = F.min(base) if agg == "min" else F.max(base)
        return expr.cast("string")

    aggs = []
    for c, t in _PROFILE_COLS:
        aggs += [
            F.count("*").cast("long").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).cast("long").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("long").alias(f"{c}__distinct"),
            render(c, t, "min").alias(f"{c}__min"),
            render(c, t, "max").alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)
    stacked = one.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.col(f"{c}__rows").alias("n_rows"),
                    F.col(f"{c}__nulls").alias("n_nulls"),
                    F.col(f"{c}__distinct").alias("n_distinct"),
                    F.col(f"{c}__min").alias("min_value"),
                    F.col(f"{c}__max").alias("max_value"),
                )
                for c, _ in _PROFILE_COLS
            ])
        ).alias("s")
    )
    return stacked.select("s.*").orderBy("column_name")
