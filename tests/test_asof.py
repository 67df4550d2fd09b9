"""As-of / range join edge cases: no prior match, equal timestamps,
tolerance bounds, bucket-boundary pairs."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from ravelytics_spark.operators.asof import asof_join, range_join_binned


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute, 0)


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [Row(k="a", ts=_ts(10), ev="e1"), Row(k="a", ts=_ts(30), ev="e2"),
         Row(k="b", ts=_ts(5), ev="e3")],
    )
    right = spark.createDataFrame(
        [Row(k="a", ts=_ts(8), px=1.0), Row(k="a", ts=_ts(25), px=2.0),
         Row(k="b", ts=_ts(50), px=9.0)],  # after b's event → no match
    )
    got = {r.ev: r.px for r in asof_join(left, right, "k", "ts", "ts").collect()}
    assert got == {"e1": 1.0, "e2": 2.0, "e3": None}


def test_asof_equal_ts_matches_inclusively(spark):
    left = spark.createDataFrame([Row(k="a", ts=_ts(10), ev="e1")])
    right = spark.createDataFrame([Row(k="a", ts=_ts(10), px=7.0)])
    got = asof_join(left, right, "k", "ts", "ts").collect()
    assert got[0].px == 7.0


def test_asof_tolerance(spark):
    left = spark.createDataFrame([Row(k="a", ts=_ts(30), ev="e1")])
    right = spark.createDataFrame([Row(k="a", ts=_ts(0), px=1.0)])
    loose = asof_join(left, right, "k", "ts", "ts", tolerance_s=3600).collect()
    tight = asof_join(left, right, "k", "ts", "ts", tolerance_s=600).collect()
    assert loose[0].px == 1.0
    assert tight[0].px is None  # 30 min > 10 min tolerance


def test_resample_ffill_gap_filling(spark):
    from ravelytics_spark.operators.resample import resample_ffill

    ev = spark.createDataFrame(
        [Row(user_id=1, ts=_ts(5), value=10.0),   # 00:05
         Row(user_id=1, ts=_ts(40), value=20.0)],  # 00:40
    )
    got = resample_ffill(ev, "user_id", "ts", "value", step_s=600).collect()
    by_min = {r.grid_ts.minute: r.filled_value for r in got}
    # grid 00:00..00:40 every 10 min; 00:00 precedes the first event
    assert by_min == {0: None, 10: 10.0, 20: 10.0, 30: 10.0, 40: 20.0}


def test_range_join_boundary_buckets(spark):
    """Pairs straddling a bucket boundary must still pair (adjacent-
    bucket probe)."""
    left = spark.createDataFrame([Row(k="a", la="L", lts=_ts(29))])
    right = spark.createDataFrame(
        [Row(k="a", rb="R1", rts=_ts(31)), Row(k="a", rb="R2", rts=_ts(59))]
    )
    got = {
        r.rb
        for r in range_join_binned(
            left, right, on="k", left_ts="lts", right_ts="rts", window_s=600
        ).collect()
    }
    assert got == {"R1"}  # 2 min apart matches; 30 min apart doesn't


def test_range_join_fractional_window(spark):
    """Fractional window_s must widen the bucket (ceil), not truncate:
    int(90.5)=90 would put ts=0.5s and ts=91s two buckets apart and
    silently drop the in-window pair."""
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    left = spark.createDataFrame([Row(k="a", la="L", lts=base + datetime.timedelta(seconds=91))])
    right = spark.createDataFrame(
        [Row(k="a", rb="IN", rts=base + datetime.timedelta(seconds=0, microseconds=500_000)),
         Row(k="a", rb="OUT", rts=base + datetime.timedelta(seconds=200))]
    )
    got = {
        r.rb
        for r in range_join_binned(
            left, right, on="k", left_ts="lts", right_ts="rts", window_s=90.5
        ).collect()
    }
    assert got == {"IN"}  # 90.5s apart is within 90.5; 109s apart is not


def test_range_join_subsecond_window(spark):
    """window_s < 1 must not divide by zero (width clamps to 1)."""
    base = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame([Row(k="a", la="L", lts=base)])
    right = spark.createDataFrame([Row(k="a", rb="R", rts=base)])
    got = range_join_binned(
        left, right, on="k", left_ts="lts", right_ts="rts", window_s=0.5
    ).collect()
    assert len(got) == 1


def test_asof_forward_direction(spark):
    """Forward as-of: smallest right_ts >= left_ts; equal ts matches."""
    left = spark.createDataFrame(
        [Row(k="a", lid=1, lts=_ts(10)), Row(k="a", lid=2, lts=_ts(20)),
         Row(k="a", lid=3, lts=_ts(50))]
    )
    right = spark.createDataFrame(
        [Row(k="a", rts=_ts(5), val="early"), Row(k="a", rts=_ts(20), val="eq"),
         Row(k="a", rts=_ts(30), val="late")]
    )
    got = {
        r.lid: r.val
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts", direction="forward"
        ).collect()
    }
    # lid=1 → next at 20 ("eq"); lid=2 → equal ts matches ("eq");
    # lid=3 → nothing after 50 → null
    assert got == {1: "eq", 2: "eq", 3: None}


def test_asof_forward_tolerance(spark):
    left = spark.createDataFrame([Row(k="a", lid=1, lts=_ts(0))])
    right = spark.createDataFrame([Row(k="a", rts=_ts(30), val="far")])
    got = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        direction="forward", tolerance_s=600,
    ).collect()
    assert got[0].val is None  # 30 min ahead > 10 min tolerance


def test_time_grid_floors_pre_epoch_bounds(spark):
    """cast-to-long truncates toward zero: a 1969 timestamp must floor
    DOWN to the earlier grid boundary, not up toward epoch (same class
    as the asof pre-epoch fraction fix)."""
    from datetime import datetime

    from ravelytics_spark.operators.resample import time_grid

    events = spark.createDataFrame(
        [
            (1, datetime(1969, 12, 31, 23, 59, 30)),  # epoch -30s
            (1, datetime(1970, 1, 1, 0, 1, 30)),      # epoch +90s
        ],
        ["k", "ts"],
    )
    grid = sorted(
        r.grid_ts for r in time_grid(events, "k", "ts", step_s=60).collect()
    )
    # -30s floors to -60s → grid starts 1969-12-31 23:59:00 and covers
    # the first event; truncation would have started at 00:00:00
    assert grid[0] == datetime(1969, 12, 31, 23, 59)
    assert grid[-1] == datetime(1970, 1, 1, 0, 1)
    assert len(grid) == 3
