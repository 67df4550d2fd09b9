from __future__ import annotations

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Spawned Python workers (e.g. the transformWithStateInPandas driver
# worker) unpickle module-level classes BY REFERENCE — they need the
# package importable via PYTHONPATH, not just this process's sys.path.
# Must be set before the JVM launches.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from ravelytics_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("RAVELYTICS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # RAVELYTICS_TEST_CPUS lets scripts/run_suite.py split the box
    # across parallel pytest workers (each worker gets 32/N threads);
    # a plain `pytest tests/` keeps the historical local[8].
    cpus = int(os.environ.get("RAVELYTICS_TEST_CPUS", "8"))
    s = get_spark(
        app_name="ravelytics_tests",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_ORACLE
