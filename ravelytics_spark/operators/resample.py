"""Time-series resampling: regularize an event stream onto a fixed
grid with forward-fill — the gap-filling operator BI tools expect
(ClickHouse spells it WITH FILL; DuckDB generate_series + ASOF).

Composition, all built-ins:

1. grid = per key, ``sequence(floor(min_ts), floor(max_ts), step)``
   exploded — one row per (key, grid_ts). ``sequence`` is generated
   per key in the map stage; no shuffle beyond the min/max agg.
2. ``asof_join(grid, events)`` — backward fill: each grid point takes
   the latest event value at-or-before it (one shuffle on the key).

Grid density is (span / step) per key — the same blow-up any engine
pays for gap filling; pick the step to match the query, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ravelytics_spark.operators.asof import asof_join


def time_grid(
    events: DataFrame, key: str, ts: str, step_s: int
) -> DataFrame:
    """One row per (key, grid_ts): the key's observed span floored to
    ``step_s`` boundaries."""
    bounds = events.groupBy(key).agg(
        F.min(F.unix_timestamp(ts)).alias("__lo"),
        F.max(F.unix_timestamp(ts)).alias("__hi"),
    )
    step = F.lit(step_s)
    # floor, not cast-to-long: cast truncates toward zero, which for
    # pre-1970 (negative-epoch) timestamps would start the grid one step
    # LATE and drop the first event's coverage (same failure class as
    # the asof epoch-seconds fix). floor == truncate for positive epochs,
    # so post-1970 grids are unchanged.
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(
                F.floor(F.col("__lo") / step).cast("long") * step,
                F.floor(F.col("__hi") / step).cast("long") * step,
                step,
            )
        ).alias("__gsec"),
    )
    return grid.select(key, F.timestamp_seconds("__gsec").alias("grid_ts"))


def resample_ffill(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    step_s: int,
) -> DataFrame:
    """(key, grid_ts, value) with the latest at-or-before event value
    forward-filled onto each grid point."""
    grid = time_grid(events, key, ts, step_s)
    right = events.select(
        F.col(key), F.col(ts), F.col(value).alias("filled_value")
    )
    return asof_join(
        grid, right, on=key, left_ts="grid_ts", right_ts=ts,
        right_cols=["filled_value"],
    ).select(key, "grid_ts", "filled_value")
