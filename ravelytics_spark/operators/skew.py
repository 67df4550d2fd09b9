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


def fan_out_scan(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Fix an under-parallel input before a CPU-dense expansion stage.

    The winnowing/shingling pipelines explode each document into one row
    per char/word position and hash every row; when the upstream scan
    has few partitions (one unsplittable file, a single row group), that
    whole expansion serializes onto a handful of cores while the rest of
    the cluster idles — the classic input-skew case. A round-robin
    ``repartition(defaultParallelism)`` of the RAW rows moves the
    expansion behind a shuffle of the un-exploded bytes (strictly
    smaller than the exploded exchange that follows it) and restores
    full parallelism.

    No-op when the scan already has >= defaultParallelism/min_factor
    partitions — i.e. on any well-laid-out warehouse input at scale, so
    a 100 TB corpus in 128 MB-1 GB files never pays the extra shuffle.
    Round-robin (not keyed) so the pipeline's own downstream exchange
    (window/groupBy on the doc key) survives as the ReusedExchange point
    deduping the expansion across self-join branches.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if _scan_partitions(df, sc) * min_factor > target:
        return df
    return df.repartition(target)


# (applicationId, analyzed-plan semanticHash) -> scan partition count.
# Materializing df.rdd just to read its partition count costs ~0.15 s
# per call; the count is a pure plan property (input file layout ×
# split config), so probing it once per plan per session is safe — a
# re-read of the same path re-resolves to the same analyzed plan, and a
# wrong entry could only mis-size parallelism, never change results.
_SCAN_PARTITIONS_MEMO: dict[tuple, int] = {}


_SCAN_PARTITIONS_MEMO_CAP = 4096  # a long-lived session must not grow it unboundedly


def _scan_partitions(df: DataFrame, sc) -> int:
    try:
        key = (sc.applicationId, df._jdf.queryExecution().analyzed().semanticHash())
    except Exception:
        key = None
    if key is not None and key in _SCAN_PARTITIONS_MEMO:
        return _SCAN_PARTITIONS_MEMO[key]
    n = df.rdd.getNumPartitions()
    if key is not None:
        if len(_SCAN_PARTITIONS_MEMO) >= _SCAN_PARTITIONS_MEMO_CAP:
            # FIFO eviction (dicts preserve insertion order): a stale
            # entry only mis-sizes parallelism on re-probe, never
            # changes results, so simple is fine here.
            _SCAN_PARTITIONS_MEMO.pop(next(iter(_SCAN_PARTITIONS_MEMO)))
        _SCAN_PARTITIONS_MEMO[key] = n
    return n


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
