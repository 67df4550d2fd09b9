"""Warehouse-scan source (SURVEY OP-S11): read back columnar tables.

The reference reads its warehouse through ClickHouse MergeTree scans
(`docker-compose.yml:102-120` Superset → clickhouse-connect). Here the
warehouse is parquet; Spark's vectorized reader + Catalyst give column
pruning and predicate pushdown for free — callers should ``select`` and
``filter`` on the returned DataFrame and let pushdown reach the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns written with parquet TIMESTAMP(NANOS) logical type, which Spark's
# reader rejects. With spark.sql.legacy.parquet.nanosAsLong they surface as
# LongType nanos-since-epoch; we convert to TimestampType (micros) with an
# integer DIV (lossy below-microsecond only; oracle SQL truncates the same
# way via CAST(ts_ns AS TIMESTAMP)).
_NANO_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one warehouse table. Plain ``spark.read.parquet`` — pruning,
    pushdown and vectorization are Catalyst built-ins."""
    nano_cols = _NANO_TS_COLS.get(name, ())
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in nano_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return df


def dataset_fingerprint(sf_dir: str, name: str) -> tuple:
    """Cheap driver-side fingerprint of one table's on-disk state:
    sorted (relative-path, size, mtime_ns) of every data file. Used to
    key derived-from-data caches (probed dims, collected centroids,
    unrolled plans) so an in-process rewrite of the SAME path — a
    regenerated corpus, an appended partition — invalidates them
    instead of silently serving plans built against stale data
    properties. Pure ``os.stat``; no Spark job."""
    root = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(root):
        return (root, None)
    if os.path.isfile(root):
        st = os.stat(root)
        return (root, st.st_size, st.st_mtime_ns)
    entries = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.startswith((".", "_")):
                continue  # _SUCCESS / checksums don't carry data
            p = os.path.join(dirpath, fn)
            st = os.stat(p)
            entries.append((os.path.relpath(p, root), st.st_size, st.st_mtime_ns))
    return (root, tuple(sorted(entries)))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table; also registers each as a temp view so
    ``spark.sql`` works against the same names DuckDB's oracle uses."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)  # incl. nano-ts handling
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
