"""Differential tests: every catalog query vs its DuckDB oracle (the
same check the driver's t2 harness runs, at sf0.001 for speed — set
RAVELYTICS_TEST_SF_DIR=/root/testdata/sf0.01 for the driver SF)."""

from __future__ import annotations

import pytest

from ravelytics_spark.plans.queries import REGISTRY
from ravelytics_spark.testing import compare, duckdb_connection

_ORACLE_QUERIES = [n for n, q in REGISTRY.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connection(sf_dir)


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    query = REGISTRY[name]
    problems = compare(query.spark(spark, sf_dir), con, query.oracle, name)
    assert not problems, problems
