"""Mergeable cardinality sketches (HyperLogLog) in pure relational
form — the ClickHouse ``uniqState`` / ``uniqMerge`` combinator pattern
(the reference's engine family keeps partial aggregate STATES in
tables and merges them at read time; MergeTree rollups depend on it).

Spark's ``approx_count_distinct`` computes an HLL internally but never
exposes the state, so a day×key rollup cannot be combined into
month×key without rescanning raw data. This module keeps the sketch
AS ROWS — (group..., register, max_rho) — which makes every piece of
the pattern ordinary relational algebra:

- build:   one hash + groupBy max          (``hll_sketch``)
- merge:   union + groupBy max             (``hll_merge``) — sketches
           from different days/partitions/clusters combine exactly
           (max is associative/commutative/idempotent)
- read:    harmonic estimator + linear-counting small-range fix
           (``hll_estimate``; Flajolet et al. 2007, public)

Determinism: xxhash64 is seeded and fixed; register math is integer
(``bin()`` string length gives the exact bit length — no float
log2 whose rounding could flip a rho at power-of-two boundaries), so
the same input always yields bit-identical sketches on any cluster
layout. Storage: m rows per group (m=256 default ⇒ ±~6.5% standard
error); a 100 TB warehouse stores day×key sketches (m rows each)
instead of raw ids, and month/year/all-time distinct counts become
sums over tiny tables.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rho_expr(m: int) -> tuple[F.Column, F.Column]:
    """(register, rho) for xxhash64 of the value column ``__v``.

    bucket = low log2(m) bits; rho = leading-zero count of the
    REMAINING 64−log2(m) bits + 1, computed exactly: shift out the
    bucket bits, take the unsigned bit LENGTH via ``length(bin(w))``
    (bin() prints no leading zeros), rho = (64−p) − bitlen + 1.
    """
    p = int(math.log2(m))
    assert 2**p == m, "m must be a power of two"
    h = F.xxhash64(F.col("__v"))
    bucket = F.pmod(h, F.lit(m)).cast("int")
    w = F.shiftrightunsigned(h, p)
    bitlen = F.when(w == 0, F.lit(0)).otherwise(
        F.length(F.expr(f"bin(shiftrightunsigned(xxhash64(__v), {p}))"))
    )
    rho = (F.lit(64 - p) - bitlen + F.lit(1)).cast("int")
    return bucket, rho


def hll_sketch(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None, m: int = 256
) -> DataFrame:
    """Sketch rows (group..., register int, max_rho int) — the
    ``uniqState`` analog. One hash per row, one map-side-combined
    groupBy max; null values are ignored (matching count distinct)."""
    group_cols = group_cols or []
    bucket, rho = _rho_expr(m)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col).alias("__v"))
        .select(*group_cols, bucket.alias("register"), rho.alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Combine sketch rows into coarser groups (or one global sketch):
    the ``uniqMerge`` analog. Input columns beyond ``group_cols`` +
    (register, max_rho) are dropped — e.g. merge day×key sketches to
    key sketches by passing group_cols=["key"]."""
    group_cols = group_cols or []
    return sketches.groupBy(*group_cols, "register").agg(
        F.max("max_rho").alias("max_rho")
    )


def hll_estimate(
    sketches: DataFrame, group_cols: list[str] | None = None, m: int = 256
) -> DataFrame:
    """Cardinality estimate per group from sketch rows.

    Standard HLL: E = α_m · m² / (Σ 2^−rho over all m registers, with
    absent registers contributing 2⁰ = 1); small-range correction
    switches to linear counting m·ln(m/V) when E ≤ 2.5m and V > 0
    registers are empty. Error ~1.04/√m.
    """
    group_cols = group_cols or []
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = sketches.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__z_used"),
        F.count("*").alias("__filled"),
    )
    z = F.col("__z_used") + (F.lit(m) - F.col("__filled"))  # empty regs add 1
    raw = F.lit(alpha * m * m) / z
    zeros = F.lit(m) - F.col("__filled")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est).cast("long").alias("approx_distinct")
    )
