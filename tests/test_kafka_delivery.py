"""Failure-injection tests for the produce path's delivery accounting
(sources/kafka.py:produce_records) — the round-10 verdict's missing
error-path coverage behind the wire goldens: delivery failure, partial
flush, and retry accounting, all against fake producers (no broker in
this container; the reference contract is
spotify_metadata_to_kafka.py:52-70)."""

from __future__ import annotations

import pytest

from ravelytics_spark.sources.kafka import produce_records

RECS = [(f"k{i}".encode(), f"v{i}".encode()) for i in range(10)]


class FakeProducer:
    """confluent-Producer-shaped fake: per-message outcomes scripted by
    a fail-predicate that may depend on the attempt number. Callbacks
    fire at flush time (like the real client's poll-driven delivery
    reports), not inside produce()."""

    def __init__(self, fail=None, pending_after_flush=0):
        self.fail = fail or (lambda key, attempt: None)
        self.pending_after_flush = pending_after_flush
        self.queue = []
        self.produced = []  # (topic, key, value) of every produce call
        self.attempt_counts: dict[bytes, int] = {}

    def produce(self, topic, value, key=None, callback=None):
        self.produced.append((topic, key, value))
        n = self.attempt_counts.get(key, 0) + 1
        self.attempt_counts[key] = n
        err = self.fail(key, n)
        self.queue.append((err, callback))

    def flush(self, timeout):
        for err, cb in self.queue:
            cb(err, None)
        self.queue.clear()
        return self.pending_after_flush


def test_happy_path_accounting():
    p = FakeProducer()
    out = produce_records(p, RECS, "t")
    assert out == {"delivered": 10, "attempts": 10, "retried": 0}
    # keys and values reached the producer verbatim, in order
    assert [(k, v) for _, k, v in p.produced] == RECS
    assert all(t == "t" for t, _, _ in p.produced)


def test_delivery_failure_raises_with_first_three_errors():
    bad = {b"k2", b"k5", b"k6", b"k8"}
    p = FakeProducer(fail=lambda k, n: f"broker refused {k!r}" if k in bad else None)
    with pytest.raises(RuntimeError) as exc:
        produce_records(p, RECS, "t")
    msg = str(exc.value)
    # reference contract: first 3 errors listed, total count visible
    assert "4 message(s) undeliverable" in msg
    assert msg.count("broker refused") == 3


def test_partial_flush_raises_instead_of_silent_undercount():
    """The reference ignores flush()'s pending count; here messages
    still queued after the timeout are a hard error naming the count."""
    p = FakeProducer(pending_after_flush=4)
    with pytest.raises(RuntimeError) as exc:
        produce_records(p, RECS, "t", flush_timeout=2.5)
    msg = str(exc.value)
    assert "4 message(s) still undelivered" in msg
    assert "2.5s" in msg


def test_retry_recovers_transient_failures_and_counts_attempts():
    bad = {b"k3", b"k7"}
    # fail on the first attempt only
    p = FakeProducer(fail=lambda k, n: "timeout" if k in bad and n == 1 else None)
    out = produce_records(p, RECS, "t", max_retries=2)
    assert out == {"delivered": 10, "attempts": 12, "retried": 2}
    # the two failed records were re-produced exactly once each
    assert p.attempt_counts[b"k3"] == 2
    assert p.attempt_counts[b"k7"] == 2
    assert sum(p.attempt_counts.values()) == 12


def test_retry_exhaustion_raises_with_attempt_count():
    p = FakeProducer(fail=lambda k, n: "partition leader lost" if k == b"k0" else None)
    with pytest.raises(RuntimeError) as exc:
        produce_records(p, RECS, "t", max_retries=2)
    msg = str(exc.value)
    assert "after 3 attempt(s)" in msg
    assert "1 message(s) undeliverable" in msg
    # the permanently bad record was attempted on every pass
    assert p.attempt_counts[b"k0"] == 3
    # healthy records were NOT re-produced after their success
    assert p.attempt_counts[b"k1"] == 1


def test_zero_retries_matches_reference_single_pass():
    p = FakeProducer(fail=lambda k, n: "err" if k == b"k4" else None)
    with pytest.raises(RuntimeError) as exc:
        produce_records(p, RECS, "t", max_retries=0)
    assert "after 1 attempt(s)" in str(exc.value)
    assert sum(p.attempt_counts.values()) == 10  # no second pass


def test_unkeyed_records_pass_none_key():
    recs = [(None, b"v0"), (None, b"v1")]
    p = FakeProducer()
    out = produce_records(p, recs, "tracks")
    assert out["delivered"] == 2
    assert [k for _, k, _ in p.produced] == [None, None]
