"""Round-3 regression tests: the round-2 ADVICE items and the
dtype-strict local gate (VERDICT r2 "what's wrong" #1/#2).

Covers:
- testing.py dtype-class comparison catches an uncast DuckDB sum
  (HUGEINT → float64) against a Spark BIGINT — the exact x9_pivot
  failure class;
- x9_pivot's own oracle is now cast and passes the strict gate;
- asof _epoch_seconds is floor-correct for pre-1970 fractional NTZ;
- '@weekly' schedules floor to Sunday midnight (Airflow '0 0 * * 0');
- kmv_merge enforces merged-k ≤ component-k; kmv_quantile_estimate
  rejects non-numeric payloads.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from ravelytics_spark.testing import compare, duckdb_connection

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# dtype-strict gate
# ---------------------------------------------------------------------------


def test_gate_catches_planted_uncast_sum(spark):
    """A deliberately-uncast DuckDB sum() (HUGEINT → float64 via fetchdf)
    against a Spark bigint must FAIL the local gate now — round 2's
    x9_pivot escaped precisely because 1.0 == 1 passed the value check."""
    con = duckdb_connection(SF)
    sp = spark.sql("SELECT CAST(3 AS BIGINT) AS s")
    problems = compare(sp, con, "SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)", "planted")
    assert problems, "uncast HUGEINT sum must trip the dtype-strict gate"
    assert "dtype class mismatch" in problems[0]
    # and the cast variant passes
    assert (
        compare(sp, con, "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)", "cast")
        == []
    )


def test_x9_pivot_oracle_now_type_exact(spark):
    from ravelytics_spark.plans.queries import REGISTRY

    entry = REGISTRY["x9_pivot"]
    assert "CAST(sum" in entry.oracle  # the r2 fix: BIGINT-cast aggregates
    con = duckdb_connection(SF)
    assert compare(entry.spark(spark, SF), con, entry.oracle, "x9_pivot") == []


# ---------------------------------------------------------------------------
# asof: pre-epoch fractional TIMESTAMP_NTZ
# ---------------------------------------------------------------------------


def test_epoch_seconds_ntz_pre_epoch_fraction(spark):
    from ravelytics_spark.operators.asof import _epoch_seconds

    df = spark.sql(
        "SELECT TIMESTAMP_NTZ'1969-12-31 23:59:59.3' AS ts "
        "UNION ALL SELECT TIMESTAMP_NTZ'1970-01-01 00:00:00.25' "
        "UNION ALL SELECT TIMESTAMP_NTZ'1969-12-31 23:59:58.5'"
    )
    vals = sorted(
        r.s for r in df.select(_epoch_seconds(df, "ts").alias("s")).collect()
    )
    assert vals == pytest.approx([-1.5, -0.7, 0.25])


# ---------------------------------------------------------------------------
# schedule: '@weekly' anchors on Sunday
# ---------------------------------------------------------------------------


def test_weekly_floors_to_sunday_midnight():
    from ravelytics_spark.schedule import due_runs

    # Sunday-anchored weeks: ...06-29, 07-06, 07-13... With start Monday
    # 2025-06-30, the first interval on/after start begins Sunday 07-06;
    # by Monday 07-14 that interval (07-06..07-13) is the only closed one.
    runs = due_runs(
        "@weekly", datetime(2025, 6, 30), datetime(2025, 7, 14), catchup=True
    )
    assert runs == [datetime(2025, 7, 6)]  # a Sunday, not a Thursday
    assert all(r.weekday() == 6 for r in runs)


def test_daily_unaffected_by_anchor_shift():
    from ravelytics_spark.schedule import due_runs

    runs = due_runs(
        "@daily", datetime(2025, 7, 1), datetime(2025, 7, 4, 12), catchup=True
    )
    assert runs == [
        datetime(2025, 7, 1),
        datetime(2025, 7, 2),
        datetime(2025, 7, 3),
    ]


# ---------------------------------------------------------------------------
# KMV guardrails
# ---------------------------------------------------------------------------


def test_kmv_merge_rejects_larger_k(spark):
    from ravelytics_spark.operators.sketches import kmv_merge, kmv_sketch

    df = spark.range(1000).selectExpr("id AS v")
    sk = kmv_sketch(df, "v", k=64)
    # The guard is lazy (woven into the merge plan, no build-time job):
    # building the over-k merge succeeds, executing it fails loudly.
    bad = kmv_merge(sk, k=256)
    with pytest.raises(Exception, match="exceeds smallest component"):
        bad.collect()
    # equal-k merge still fine and carries sketch_k forward
    merged = kmv_merge(sk, k=64)
    assert "sketch_k" in merged.columns
    assert merged.count() <= 64


def test_kmv_quantile_rejects_non_numeric(spark):
    from ravelytics_spark.operators.sketches import (
        kmv_quantile_estimate,
        kmv_sketch,
    )

    df = spark.createDataFrame([("a",), ("b",)], ["v"])
    sk = kmv_sketch(df, "v", k=16)
    with pytest.raises(TypeError, match="numeric-valued"):
        kmv_quantile_estimate(sk, [0.5])


def test_dedup_stream_store_probe_spark_side(spark, tmp_path):
    """Partitioned store layout (no top-level *.parquet files) must still
    be detected — the r2 os.listdir probe read it as empty."""
    from ravelytics_spark.streaming.dedup_stream import start_dedup_ingest  # noqa: F401

    store = str(tmp_path / "store")
    spark.range(5).selectExpr("id", "CAST(id AS STRING) AS part").write.partitionBy(
        "part"
    ).parquet(store)
    # the probe the fixed code path uses:
    probed = spark.read.parquet(store)
    assert probed.count() == 5
