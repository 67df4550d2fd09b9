"""As-of and range joins — time-series operators Spark lacks natively,
composed from built-in relational ops (no UDFs, no driver loops).

``asof_join``: for each left row, the single right row with the largest
``right_ts <= left_ts`` per key (classic backward as-of; think "enrich
each event with the latest prior artist state"). Physical shape is the
union-window trick:

    tag sides → unionByName → window last_value(right cols) over
    (key ORDER BY ts, side) rows unbounded preceding → keep left rows

One shuffle on (key), no N×M expansion, no range explosion — this is
the canonical scale-out as-of (a sort-merge of both sides on the same
key+ts order). Tolerance bounds stale matches.

``range_join_binned``: equi-bin acceleration for |left.ts − right.ts|
≤ window joins: both sides bucket to ⌊ts/width⌋, left explodes to the
two adjacent buckets (any within-window partner must land there), join
on (key, bucket), then the exact predicate filters. Turns a theta join
(nested-loop at scale) into an equi-join shuffle.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import types as T
from pyspark.sql import functions as F


def _epoch_seconds(df: DataFrame, ts_col: str) -> F.Column:
    """Epoch seconds WITH sub-second fraction, for numeric, TIMESTAMP,
    and TIMESTAMP_NTZ columns.

    - numeric: plain cast (already seconds);
    - TIMESTAMP (instant): ``unix_micros`` — exact and tz-independent;
    - TIMESTAMP_NTZ: no direct double cast exists, and routing through
      a session-tz cast would shift values across DST boundaries, so
      epoch micros come from ``timestampdiff(MICROSECOND, ...)`` against
      an NTZ epoch literal (tz-free integer math, exact for ±292k years).
      A SECOND-diff + fraction composition would be wrong for pre-1970
      fractional values (truncate-toward-zero whole + always-positive
      fraction: 1969-12-31 23:59:59.3 → 0.3 instead of -0.7).
      ``unix_timestamp()`` is wrong twice here: tz-dependent AND
      truncating.
    """
    dtype = df.schema[ts_col].dataType
    if isinstance(dtype, T.TimestampType):
        return (F.unix_micros(F.col(ts_col)) / F.lit(1_000_000)).cast("double")
    if isinstance(dtype, T.TimestampNTZType):
        micros = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts_col})"
        )
        return (micros / F.lit(1_000_000)).cast("double")
    return F.col(ts_col).cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tolerance_s: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join. ``backward`` (default): largest right_ts <= left_ts
    per key; ``forward``: smallest right_ts >= left_ts. Right columns
    come back null where no match exists (or it exceeds
    ``tolerance_s``). Same one-shuffle union-window shape either way —
    forward just flips the tag order and carries FIRST over the
    following frame instead of LAST over the preceding one."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    backward = direction == "backward"
    # At equal ts the right row must fall inside the left row's frame:
    # backward frames end at the current row → right sorts first (0 < 1);
    # forward frames start at the current row → right sorts after.
    left_tag, right_tag = (1, 0) if backward else (0, 1)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(left_tag).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__rts"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    if backward:
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", "__side")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    carried = unioned.select(
        "__k",
        "__ts",
        "__side",
        "__lrow",
        *[carry(f"__r_{c}").alias(f"__r_{c}") for c in right_cols],
        carry("__rts").alias("__rts"),
    ).filter(F.col("__side") == left_tag)

    if tolerance_s is not None:
        # sub-second-exact, tz-independent gap (unix_timestamp would
        # truncate to whole seconds and shift NTZ values by session tz)
        lsec = _epoch_seconds(carried, "__ts")
        rsec = _epoch_seconds(carried, "__rts")
        gap = lsec - rsec if backward else rsec - lsec
        in_tol = F.col("__rts").isNotNull() & (gap <= tolerance_s)
        carried = carried.select(
            "__k",
            "__ts",
            "__lrow",
            *[
                F.when(in_tol, F.col(f"__r_{c}")).otherwise(F.lit(None)).alias(f"__r_{c}")
                for c in right_cols
            ],
        )

    return carried.select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        *[F.col(f"__r_{c}").alias(c) for c in right_cols],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_s: float,
) -> DataFrame:
    """All (left, right) pairs with equal key and |left_ts − right_ts|
    ≤ window_s, as an equi-join on (key, time-bucket)."""
    # ceil, not truncate: bucket width must be ≥ window_s so any pair
    # within the window is at most one bucket apart (the ±1 explode).
    # int(90.5)=90 would silently drop pairs 2 buckets apart; window_s<1
    # would make width 0 (divide-by-zero).
    width = max(1, math.ceil(window_s))
    # epoch seconds WITH sub-second fraction (dtype-aware: a bare
    # cast("double") analyzes only for numeric inputs — TIMESTAMP_NTZ
    # rejects it, and unix_timestamp() truncates sub-seconds).
    l_b = left.withColumn("__lsec", _epoch_seconds(left, left_ts))
    r_b = right.withColumn("__rsec", _epoch_seconds(right, right_ts)).withColumn(
        "__bucket", F.floor(F.col("__rsec") / width)
    )
    l_exploded = l_b.withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor(F.col("__lsec") / width) - 1,
                F.floor(F.col("__lsec") / width),
                F.floor(F.col("__lsec") / width) + 1,
            )
        ),
    )
    joined = l_exploded.join(r_b, [on, "__bucket"])
    return joined.filter(
        F.abs(F.col("__lsec") - F.col("__rsec")) <= window_s
    ).drop("__bucket", "__lsec", "__rsec")
