"""Stream-stream event-time interval joins.

Extends SURVEY §2.8 beyond the reference's append-only pipe (the
reference has NO stream-stream join at all — its Kafka engine feeds a
single MV chain, `001_init_spotify_tracks.sql:50-74`): view-to-click
attribution is the canonical interval join every clickstream product
needs, and Spark's watermarked stream-stream inner join is the native
way to express it with bounded state.

State-bound reasoning for 100 TB/day streams: BOTH sides carry event-
time watermarks and the join predicate carries BOTH a lower and an
upper time bound, so Spark can drop view state once
`watermark > view_ts + attribution window` and click state once
`watermark > click_ts` — state is O(traffic inside the window), not
O(stream history). Without the two-sided time constraint the state
store grows without bound; that shape is refused here by construction
(the interval is part of the API, not an optional filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_click_attribution(
    views: DataFrame,
    clicks: DataFrame,
    attribution_window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner interval join: each click is
    attributed to every view by the same user within the preceding
    ``attribution_window``.

    ``views``  schema: view_id long, user_id long, view_ts timestamp
    ``clicks`` schema: click_id long, user_id long, click_ts timestamp

    Returns (user_id, view_id, click_id, view_ts, click_ts, lag_s).
    """
    v = (
        views.withWatermark("view_ts", watermark)
        .withColumnRenamed("user_id", "v_user_id")
    )
    c = clicks.withWatermark("click_ts", watermark)
    joined = v.join(
        c,
        (F.col("v_user_id") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
        "inner",
    )
    return joined.select(
        "user_id",
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
        (
            F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")
        ).alias("lag_s"),
    )
