"""Schedule cadence semantics: the reference DAG's ``@daily`` +
``catchup=False`` contract (spotify_ingest.py:148-158) reproduced as
deterministic, dependency-free functions, plus a parquet-friendly run
ledger for exactly-once-per-interval execution.

Airflow's model (public docs): a schedule slices time into intervals;
the run for interval [d, d+1) becomes DUE when the interval CLOSES
(at d+1) and is identified by its interval start (the "execution
date"). ``catchup=True`` backfills every missed closed interval since
``start_date``; ``catchup=False`` runs only the most recent closed
interval. The reference relies on exactly this: a daily pull whose
runs are identified by day, resumable after downtime without
re-running history (catchup=False) — while a warehouse backfill job
would flip catchup on.

These functions compose with ``ravelytics_spark.pipeline.Pipeline``
(the dependency/retry/skip runner): the scheduler decides WHICH
interval runs, the runner executes the steps for it. The ledger is the
idempotence guard between them — an interval already recorded as
successful is never re-run, so a crashed scheduler process resumes
where it left off (the same role as Airflow's dag_run table).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import date, datetime, time, timedelta

_INTERVALS: dict[str, timedelta] = {
    "@hourly": timedelta(hours=1),
    "@daily": timedelta(days=1),
    "@weekly": timedelta(weeks=1),
}


def _interval(schedule: str) -> timedelta:
    try:
        return _INTERVALS[schedule]
    except KeyError:
        raise ValueError(
            f"unsupported schedule {schedule!r}; one of {sorted(_INTERVALS)}"
        ) from None


def _floor_to_interval(t: datetime, step: timedelta) -> datetime:
    # Anchor on 1970-01-04 (a SUNDAY) so '@weekly' floors to Sunday
    # midnight — matching Airflow's '@weekly' = '0 0 * * 0'. 1970-01-01
    # is a Thursday; anchoring there would start weeks on Thursdays.
    # '@daily'/'@hourly' are insensitive to a whole-day anchor shift.
    # MIGRATION: a RunLedger written under the pre-fix Thursday anchor
    # holds execution dates no Sunday-anchored schedule will ever emit,
    # so a catchup=True '@weekly' job would re-run its whole history.
    # Rebuild (or translate dates -3 days) such ledgers once on upgrade;
    # daily/hourly ledgers are unaffected.
    anchor = datetime.combine(date(1970, 1, 4), time())
    return anchor + ((t - anchor) // step) * step


def due_runs(
    schedule: str,
    start_date: datetime,
    now: datetime,
    catchup: bool = True,
) -> list[datetime]:
    """Execution dates (interval starts) of all CLOSED intervals in
    [start_date, now), oldest first. ``catchup=False`` keeps only the
    most recent one — the reference ingest's mode, where a 3-day outage
    yields ONE run on recovery, not three."""
    step = _interval(schedule)
    first = _floor_to_interval(start_date, step)
    if first < start_date:
        first += step  # Airflow: intervals start on/after start_date
    last_closed = _floor_to_interval(now, step) - step
    if last_closed < first:
        return []
    if not catchup:
        return [last_closed]
    out = []
    d = first
    while d <= last_closed:
        out.append(d)
        d += step
    return out


@dataclass(frozen=True)
class IntervalBounds:
    """Half-open data interval [start, end) for one execution date —
    the WHERE clause bounds an incremental extract filters on."""

    start: datetime
    end: datetime


def interval_bounds(schedule: str, execution_date: datetime) -> IntervalBounds:
    return IntervalBounds(execution_date, execution_date + _interval(schedule))


class RunLedger:
    """Completed-run record keyed by (job, execution_date) — JSONL on
    any shared filesystem, append-only (each line one completed run).
    At scale the same schema lives as a tiny parquet/Delta table; the
    append-only discipline means concurrent schedulers can only
    duplicate work, never lose it (re-recording a run is idempotent)."""

    def __init__(self, path: str):
        self._path = path

    def completed(self, job: str) -> set[datetime]:
        if not os.path.exists(self._path):
            return set()
        out = set()
        with open(self._path) as fh:
            for line in fh:
                rec = json.loads(line)
                if rec["job"] == job:
                    out.add(datetime.fromisoformat(rec["execution_date"]))
        return out

    def record(self, job: str, execution_date: datetime) -> None:
        with open(self._path, "a") as fh:
            fh.write(
                json.dumps(
                    {"job": job, "execution_date": execution_date.isoformat()}
                )
                + "\n"
            )


def runs_to_do(
    ledger: RunLedger,
    job: str,
    schedule: str,
    start_date: datetime,
    now: datetime,
    catchup: bool = True,
) -> list[datetime]:
    """Due runs minus already-completed ones: what the scheduler should
    execute right now. With catchup=False this is at most one
    execution date (the latest closed interval, if unrecorded)."""
    done = ledger.completed(job)
    return [d for d in due_runs(schedule, start_date, now, catchup) if d not in done]
