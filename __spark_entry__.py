"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship techno-stack query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full t2 catalog from
``ravelytics_spark.plans.queries`` (one entry per SURVEY §2 operator,
each with its DuckDB oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ravelytics_spark.plans.queries import REGISTRY  # noqa: E402
from ravelytics_spark.session import configure_existing  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_existing(spark)
    return REGISTRY["flagship_techno_stack"].spark(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(query.spark) for name, query in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (omitted for
    harness-only operators → driver records rows-only check)."""
    return {
        name: query.oracle for name, query in REGISTRY.items() if query.oracle is not None
    }
