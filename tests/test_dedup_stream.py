"""Continuous near-dup ingest: in-batch dedup, cross-batch dedup
against the store, replay convergence, and near-dup (not just exact)
recall across batches."""

from __future__ import annotations

import json

import pytest

from ravelytics_spark.streaming.dedup_stream import (
    dedup_batch_against_store,
    start_dedup_ingest,
)

LOREM = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "detroit techno records all night long in a warehouse by the river"
)
OTHER = (
    "completely different content about orbital mechanics and the "
    "restricted three body problem with lagrange points and halo orbits"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_batch_dedup_in_batch_and_vs_store(spark):
    b1 = _batch(spark, [(1, LOREM), (2, OTHER)])
    s1 = dedup_batch_against_store(b1, None)
    assert {r.doc_id for r in s1.collect()} == {1, 2}
    store = s1

    # batch 2: exact dup of stored doc, near-dup of stored doc,
    # fresh doc, and an in-batch dup pair. The near-dup appends words
    # (J ≈ 19/21); a mid-doc substitution in a 23-word doc would kill
    # 5 of 19 shingles (J ≈ 0.58) and legitimately clear the 0.7 bar.
    near = LOREM + " tonight again"
    b2 = _batch(
        spark,
        [
            (10, LOREM),          # exact dup vs store → dropped
            (11, near),           # near-dup vs store → dropped
            (12, OTHER + " extra trailing words here"),  # near-dup vs store
            (13, "fresh standalone content with many unusual words "
                 "that matches nothing else in any earlier batch"),
            (14, "identical twin sentence about nothing in particular "
                 "repeated across ids fourteen and fifteen"),
            (15, "identical twin sentence about nothing in particular "
                 "repeated across ids fourteen and fifteen"),
        ],
    )
    s2 = dedup_batch_against_store(b2, store)
    kept = {r.doc_id for r in s2.collect()}
    assert 10 not in kept and 11 not in kept and 12 not in kept
    assert 13 in kept
    assert 14 in kept and 15 not in kept  # smaller id survives


def test_replaying_stored_content_is_a_noop(spark):
    b1 = _batch(spark, [(1, LOREM), (2, OTHER)])
    store = dedup_batch_against_store(b1, None)
    replay = dedup_batch_against_store(b1, store)
    assert replay.count() == 0  # every doc matches itself at 1.0


@pytest.mark.parametrize("crash_before_ledger", [False, True])
def test_streaming_ingest_end_to_end(spark, tmp_path, crash_before_ledger):
    src = tmp_path / "src"
    store = tmp_path / "store"
    ckpt = tmp_path / "ckpt"
    ledger = tmp_path / "ledger.jsonl"
    src.mkdir()

    def write_src(name, rows):
        (src / name).write_text(
            "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in rows) + "\n"
        )

    def run():
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = start_dedup_ingest(
            stream, str(store), str(ckpt), str(ledger)
        )
        q.awaitTermination(120)

    write_src("b1.json", [(1, LOREM), (2, OTHER)])
    run()
    assert {r.doc_id for r in spark.read.parquet(str(store)).collect()} == {1, 2}

    if crash_before_ledger:
        # simulate "store appended, ledger lost": drop the ledger AND
        # the checkpoint so the next run replays everything — the
        # content-level dedup must keep the store unchanged
        import shutil

        ledger.unlink()
        shutil.rmtree(ckpt)

    write_src("b2.json", [(10, LOREM), (11, "brand new content that is "
                                            "unlike anything stored so far "
                                            "with plenty of distinct words")])
    run()
    got = {r.doc_id for r in spark.read.parquet(str(store)).collect()}
    assert got == {1, 2, 11}
    # the signature column rides along for future batches
    assert "sig" in spark.read.parquet(str(store)).columns


def test_store_absent_detection_uses_error_class():
    """ADVICE r3: first-batch detection must compare the structured
    error class exactly, not substring-match str(exc) — a transient
    failure whose message merely MENTIONS these tokens must fail the
    batch (else cross-batch dedup is silently skipped and duplicates
    append)."""
    from ravelytics_spark.streaming.dedup_stream import _is_store_absent

    class FakeExc(Exception):
        def __init__(self, condition, msg):
            super().__init__(msg)
            self._c = condition

        def getCondition(self):
            return self._c

    assert _is_store_absent(FakeExc("PATH_NOT_FOUND", "Path does not exist"))
    assert _is_store_absent(
        FakeExc("UNABLE_TO_INFER_SCHEMA.PARQUET", "empty dir")
    )
    # transient error whose MESSAGE contains the token: not absent
    assert not _is_store_absent(
        FakeExc(
            "FAILED_READ_FILE",
            "retry exhausted; inner cause mentioned PATH_NOT_FOUND upstream",
        )
    )
    # no structured class at all: only a leading bracketed class counts
    assert _is_store_absent(Exception("[PATH_NOT_FOUND] Path does not exist: /x"))
    assert not _is_store_absent(
        Exception("S3 timeout while listing; saw PATH_NOT_FOUND in a nested cause")
    )
