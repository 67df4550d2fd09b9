"""Catalog-wide empty-input differential (round 10).

The x245 fallback asymmetry (ADVICE r9) generalized: a Spark-side
degenerate-input shape that differs from the oracle's — ungrouped SQL
aggregates returning one NULL-ish row where a filter(lit(False))
returns zero, SQL ROLLUP/CUBE emitting the grand-total row over an
empty table where Spark emits none, ANSI DIV throwing where DuckDB's
`// 0` is NULL, driver-side max()/comparison crashes on empty
bounded collects. The round-10 sweep found 8 such latent bugs across
the certified catalog (x8/x12/x14 rollup family, xq_validation_report,
x146, x177, x206, x217) — all fixed; this test pins ALL oracle-backed
entries against their oracles on a dataset where every table exists
but is EMPTY, so the class can't regress or re-enter via new batches.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from conftest import tier

from ravelytics_spark.plans.queries import REGISTRY
from ravelytics_spark.testing import compare, duckdb_connection

_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    from ravelytics_spark.sources.tables import TABLE_NAMES

    d = str(tmp_path_factory.mktemp("empty_catalog_sf"))
    for name in TABLE_NAMES:
        t = pq.read_table(f"{_SF}/{name}.parquet")
        pq.write_table(t.slice(0, 0), f"{d}/{name}.parquet")
    return d


def test_every_oracle_entry_matches_on_empty_tables(spark, empty_sf):
    """One sweep, all failures reported together (a parametrized form
    would re-pay session fixture accounting 400x)."""
    con = duckdb_connection(empty_sf)
    bad: dict[str, str] = {}
    # Fast tier: deterministic quarter (RAVELYTICS_FULL=1 sweeps all) —
    # the class-level pin stays, the per-entry sweep is the full gate's.
    names = set(
        tier(
            sorted(n for n, q in REGISTRY.items() if q.oracle is not None),
            salt="empty",
        )
    )
    for name, q in REGISTRY.items():
        if q.oracle is None or name not in names:
            continue  # harness entries build their own inputs
        try:
            problems = compare(q.spark(spark, empty_sf), con, q.oracle, name)
            if problems:
                bad[name] = problems[0][:160]
        except Exception as e:  # noqa: BLE001 — collect, don't abort
            bad[name] = f"EXC {str(e).splitlines()[0][:160]}"
    assert not bad, f"empty-input asymmetries: {bad}"
