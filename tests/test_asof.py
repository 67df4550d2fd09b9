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
