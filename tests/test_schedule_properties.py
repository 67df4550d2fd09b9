"""Property-based tests (hypothesis) for the scheduling semantics —
the pure-Python surface where randomized inputs are cheap.

due_runs reproduces Airflow's closed-interval contract (see
ravelytics_spark/schedule.py): these properties pin it for ARBITRARY
start/now pairs, not just the example dates the unit tests use.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from ravelytics_spark.schedule import (
    RunLedger,
    due_runs,
    interval_bounds,
    runs_to_do,
)

SCHEDULES = ["@hourly", "@daily", "@weekly"]
STEP = {
    "@hourly": timedelta(hours=1),
    "@daily": timedelta(days=1),
    "@weekly": timedelta(weeks=1),
}

dts = st.datetimes(min_value=datetime(1990, 1, 1), max_value=datetime(2080, 1, 1))


@settings(max_examples=300, deadline=None)
@given(schedule=st.sampled_from(SCHEDULES), start=dts, span=st.timedeltas(
    min_value=timedelta(0), max_value=timedelta(days=400)))
def test_due_runs_invariants(schedule, start, span):
    now = start + span
    step = STEP[schedule]
    runs = due_runs(schedule, start, now)

    for r in runs:
        # intervals start on/after start_date and are CLOSED before now
        assert r >= start
        assert r + step <= now
        # floored to the schedule grid (Sunday-anchored for @weekly)
        if schedule == "@weekly":
            assert r.weekday() == 6 and r.time() == datetime.min.time()
        elif schedule == "@daily":
            assert r.time() == datetime.min.time()
        else:
            assert (r.minute, r.second, r.microsecond) == (0, 0, 0)
    # consecutive runs tile time exactly: no gaps, no overlaps
    for a, b in zip(runs, runs[1:]):
        assert b - a == step
    # completeness: any grid point with a closed interval inside
    # [start, now) is present — equivalently, count matches the span
    if runs:
        first, last = runs[0], runs[-1]
        assert first - step < start  # nothing earlier was due
        assert last + 2 * step > now  # nothing later has closed


@settings(max_examples=200, deadline=None)
@given(schedule=st.sampled_from(SCHEDULES), start=dts, span=st.timedeltas(
    min_value=timedelta(0), max_value=timedelta(days=400)))
def test_catchup_false_is_exactly_the_last_due_run(schedule, start, span):
    now = start + span
    all_runs = due_runs(schedule, start, now)
    latest_only = due_runs(schedule, start, now, catchup=False)
    assert latest_only == (all_runs[-1:] if all_runs else [])


@settings(max_examples=100, deadline=None)
@given(schedule=st.sampled_from(SCHEDULES), exec_date=dts)
def test_interval_bounds_width_is_the_step(schedule, exec_date):
    b = interval_bounds(schedule, exec_date)
    assert b.end - b.start == STEP[schedule]
    assert b.start == exec_date


@settings(max_examples=50, deadline=None)
@given(
    schedule=st.sampled_from(SCHEDULES),
    start=dts,
    span=st.timedeltas(min_value=timedelta(0), max_value=timedelta(days=90)),
    done_mask=st.lists(st.booleans(), max_size=40),
)
def test_runs_to_do_is_due_minus_ledger_and_idempotent(
    schedule, start, span, done_mask, tmp_path_factory
):
    now = start + span
    ledger = RunLedger(
        str(tmp_path_factory.mktemp("ledger") / "runs.jsonl")
    )
    due = due_runs(schedule, start, now)
    recorded = {
        r for r, done in zip(due, done_mask) if done
    }
    for r in recorded:
        ledger.record("job", r)
    todo = runs_to_do(ledger, "job", schedule, start, now)
    assert todo == [r for r in due if r not in recorded]
    # recording everything outstanding drains the queue (idempotence)
    for r in todo:
        ledger.record("job", r)
    assert runs_to_do(ledger, "job", schedule, start, now) == []
