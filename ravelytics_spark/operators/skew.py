"""Skew-mitigation utilities for 100 TB joins and aggregations.

AQE's skew-join splitting (enabled in ``session.py``) handles most
sort-merge skew at runtime. These helpers cover the cases AQE can't:

- ``salted_agg`` — two-phase aggregation for hot GROUP BY keys: phase 1
  aggregates on (key, salt) so a hot key spreads over N reducers,
  phase 2 merges the N partials. Works for any algebraic aggregate
  (sum/count/min/max and their compositions, e.g. avg = sum+count).
- ``salted_left_join`` — broadcast-incompatible skewed equi-join: salt
  the skewed (big) side, EXPLODE the small side N× so every salted key
  finds its match. N× duplication of the small side is the price; use
  only when the small side doesn't fit the broadcast threshold but a
  handful of keys dominate the big side.
- ``top_keys`` — find the hot keys worth special-casing (frequency
  above a fraction threshold), so callers can split hot/cold paths.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 16,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (phase1 aggregate over rows,
    phase2 aggregate over phase-1 partials). Example::

        salted_agg(df, ["k"], {
            "n":   (F.count("*"),      F.sum("n")),
            "s":   (F.sum("v"),        F.sum("s")),
            "mx":  (F.max("v"),        F.max("mx")),
        })

    ``salt_expr`` defaults to a deterministic hash of all columns —
    spreading rows of a hot key across ``buckets`` reducers.
    """
    if salt_expr is None:
        salt_expr = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    phase1 = (
        df.withColumn("__salt", salt_expr)
        .groupBy(*keys, "__salt")
        .agg(*[p1.alias(name) for name, (p1, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[p2.alias(name) for name, (_, p2) in aggs.items()]
    )


def top_keys(df: DataFrame, key: str, min_fraction: float = 0.01, max_keys: int = 100) -> DataFrame:
    """Keys holding more than ``min_fraction`` of all rows — the hot set
    worth a separate broadcast/salted path."""
    # One scan: per-key counts, grand total as a broadcast 1-row cross
    # join over the SAME aggregated frame (ReusedExchange — no second
    # pass over df, and no single-partition window over all keys).
    counted = df.groupBy(key).count()
    total = counted.agg(F.sum("count").alias("__total"))
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("count") >= F.col("__total") * min_fraction)
        .orderBy(F.desc("count"))
        .limit(max_keys)
        .select(key, "count")
    )


def salted_left_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
) -> DataFrame:
    """Skewed big ⋈ small equi-join without broadcast: big side gets a
    deterministic content salt, small side replicates ``buckets``× via
    explode, join key becomes (key, salt). Output columns = big ∪ small
    (like ``big.join(small, key, 'left')``)."""
    non_key_cols = [c for c in big.columns]
    big_s = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in non_key_cols]), F.lit(buckets)).cast("int"),
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    joined = big_s.join(small_s, [key, "__salt"], "left")
    return joined.drop("__salt")
