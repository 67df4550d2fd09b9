"""Declarative data-quality validation — expectation checks over a
table, evaluated in ONE aggregation pass (violations counted per check),
plus referential-integrity checks via anti-join.

The reference's only data-quality machinery is runtime-defensive
skips (SURVEY §5); a warehouse at 100 TB needs measurable contracts:
null-rates, domains, uniqueness, foreign keys. All native expressions —
a full validation suite costs one scan + one tiny shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """A row-level expectation: ``predicate`` must hold for every row."""

    name: str
    predicate: Column


def not_null(col: str) -> Check:
    return Check(f"not_null_{col}", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Check:
    return Check(f"range_{col}", F.col(col).between(lo, hi))


def matches(col: str, pattern: str) -> Check:
    return Check(f"matches_{col}", F.col(col).rlike(pattern))


def in_set(col: str, values) -> Check:
    return Check(f"domain_{col}", F.col(col).isin(*values))


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """(check, violations, total) — one row per check, computed in a
    single aggregate pass over the table (no per-check scans)."""
    # A NULL predicate (e.g. NULL BETWEEN 0 AND 1) means the expectation
    # did NOT hold — coalesce to false so nulls count as violations
    # instead of silently passing through three-valued logic.
    # outer coalesce: SUM over an EMPTY table is NULL, but the report
    # contract (and the SQL-subquery oracle shape) is 0 violations of
    # 0 rows (round-10 empty-input sweep)
    aggs = [
        F.coalesce(
            F.sum(
                F.when(~F.coalesce(c.predicate, F.lit(False)), 1).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias(c.name)
        for c in checks
    ]
    wide = df.agg(F.count("*").alias("__total"), *aggs)
    stack_expr = ", ".join(f"'{c.name}', {c.name}" for c in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {stack_expr}) AS (check, violations)", "__total AS total"
    )


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """(check, violations, total): rows beyond the first per key."""
    total = df.count()
    dup_rows = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("__n"))
        .agg(F.sum(F.col("__n") - 1).alias("violations"))
    )
    return dup_rows.select(
        F.lit(f"unique_{'_'.join(cols)}").alias("check"),
        F.coalesce("violations", F.lit(0)).cast("long").alias("violations"),
        F.lit(total).cast("long").alias("total"),
    )


def check_referential(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """(check, violations, total): child rows whose FK has no parent
    (anti-join; broadcast-eligible when the parent key set is small)."""
    total = child.count()
    orphans = child.join(parent.select(F.col(pk).alias(fk)), fk, "left_anti").count()
    return child.sparkSession.createDataFrame(
        [(f"fk_{fk}", orphans, total)], ["check", "violations", "total"]
    ).select("check", F.col("violations").cast("long"), F.col("total").cast("long"))
