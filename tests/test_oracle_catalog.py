"""Differential tests: every catalog query vs its DuckDB oracle (the
same check the driver's t2 harness runs, at sf0.001 for speed — set
RAVELYTICS_TEST_SF_DIR=/root/testdata/sf0.01 for the driver SF)."""

from __future__ import annotations

import pytest
from conftest import tier

from ravelytics_spark.plans.queries import REGISTRY
from ravelytics_spark.testing import compare, duckdb_connection

# Fast tier: deterministic quarter of the catalog (RAVELYTICS_FULL=1
# sweeps everything — scripts/run_suite.py sets it; scripts/gate.py
# oracle-checks the full catalog regardless).
_ORACLE_QUERIES = tier(
    sorted(n for n, q in REGISTRY.items() if q.oracle is not None),
    salt="oracle",
)


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connection(sf_dir)


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    query = REGISTRY[name]
    problems = compare(query.spark(spark, sf_dir), con, query.oracle, name)
    assert not problems, problems
