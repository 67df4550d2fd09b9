"""Determinism sweep (odd half): every oracle-backed catalog query must
produce IDENTICAL results under different parallelism (shuffle
partitions / repartitioning change float accumulation order, collect
order, row order — anything unstable shows up as a self-mismatch long
before it shows up as an oracle mismatch).

The sweep is stride-split across two modules (test_determinism.py holds the other
half) so scripts/run_suite.py can run the halves on different workers
— as ONE module it was the suite's makespan floor (~12 min)."""

from __future__ import annotations

import pytest
from conftest import tier

from ravelytics_spark.plans.queries import REGISTRY
from ravelytics_spark.testing import _normalize

_ALL = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
# Fast tier: deterministic quarter (RAVELYTICS_FULL=1 restores all).
_NAMES = tier(_ALL[1::2], salt="determinism")


@pytest.mark.parametrize("name", _NAMES)
def test_query_stable_across_parallelism(spark, sf_dir, name):
    query = REGISTRY[name]
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        a = _normalize(query.spark(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    b = _normalize(query.spark(spark, sf_dir).toPandas())
    assert a[0] == b[0], f"{name}: columns differ across parallelism"
    assert a[1] == b[1], f"{name}: values differ across parallelism"
