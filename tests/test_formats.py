"""Format sources: declared-schema CSV/JSONL with dead-letter
quarantine, and ORC/CSV/JSON round-trips against the parquet
warehouse tables."""

from __future__ import annotations

import pytest

from ravelytics_spark.sources.formats import (
    read_csv,
    read_jsonl,
    round_trip_check,
    split_corrupt,
)

SF = "/root/testdata/sf0.01"


def test_csv_dead_letter_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,qty\n"
        "1,alpha,10\n"
        "2,beta,not_a_number\n"   # type mismatch → quarantined
        "3,gamma,30\n"
    )
    df = read_csv(spark, str(p), "id int, name string, qty int")
    clean, quarantine = split_corrupt(df)
    assert {(r.id, r.qty) for r in clean.collect()} == {(1, 10), (3, 30)}
    bad = quarantine.collect()
    assert len(bad) == 1
    assert "not_a_number" in bad[0]._corrupt_record  # raw line kept for replay


def test_jsonl_dead_letter_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        "{broken json line\n"
        '{"id": 3, "name": "c"}\n'
    )
    df = read_jsonl(spark, str(p), "id long, name string")
    clean, quarantine = split_corrupt(df)
    assert {r.id for r in clean.collect()} == {1, 3}
    assert quarantine.count() == 1


@pytest.mark.parametrize("fmt,schema", [
    ("orc", None),
    ("csv", "n_nationkey long, n_name string, n_regionkey long"),
    ("json", "n_nationkey long, n_name string, n_regionkey long"),
])
def test_round_trip_warehouse_table(spark, tmp_path, fmt, schema):
    df = spark.read.parquet(f"{SF}/nation.parquet")
    assert round_trip_check(spark, df, str(tmp_path / f"rt_{fmt}"), fmt, schema)
