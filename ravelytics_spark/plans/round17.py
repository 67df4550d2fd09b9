"""Round-17 catalog entry — snapshot change-data-capture.

* **x80_snapshot_cdc** — the snapshot-diff operator: given an old and
  a new state of a keyed table, emit one row per change with op ∈
  {insert, update, delete} — what feeds a downstream incremental
  consumer when the source only provides full snapshots (the
  poor-man's CDC; Delta's CDF produces the same shape from the log).
  Here the two states are derived deterministically from orders (the
  "new" snapshot drops a slice of keys, re-prices another slice, and
  the remainder is unchanged), so the diff's ground truth is known
  and oracle-checkable.

Physical shape: one full-outer join on the key, change classification
from null-ness + value comparison, unchanged rows dropped EARLY (the
overwhelming majority at 100 TB — the join output is change-sized,
the shuffle is snapshot-sized on the key, and bucketing both
snapshots by the key makes even that co-located).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ravelytics_spark.plans.registry import q
from ravelytics_spark.sources.tables import load_table


def snapshot_cdc(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """(op, key, old/new values) for every difference between two
    keyed snapshots; unchanged keys produce nothing."""
    # explicit presence markers, NOT null-ness of a value column — a
    # present row whose compare column is legitimately NULL must not
    # read as a missing row
    o = old.select(
        F.col(key).alias("__k"),
        F.lit(True).alias("__o_present"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key).alias("__k"),
        F.lit(True).alias("__n_present"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, "__k", "full_outer")
    is_del = F.col("__n_present").isNull()
    is_ins = F.col("__o_present").isNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    op = (
        F.when(is_del, "delete").when(is_ins, "insert").when(changed, "update")
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            "op",
            F.col("__k").alias(key),
            *[F.col(f"__o_{c}").alias(f"old_{c}") for c in compare_cols],
            *[F.col(f"__n_{c}").alias(f"new_{c}") for c in compare_cols],
        )
    )


_CDC_ORACLE = """
WITH old_snap AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
new_snap AS (
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1000.0
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 7 <> 0
)
SELECT op, o_orderkey, old_status, old_price, new_status, new_price FROM (
    SELECT CASE WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'update'
           END AS op,
           COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           o.o_orderstatus AS old_status, o.o_totalprice AS old_price,
           n.o_orderstatus AS new_status, n.o_totalprice AS new_price
    FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey)
)
WHERE op IS NOT NULL
ORDER BY o_orderkey
"""


@q(
    "x80_snapshot_cdc",
    "OP-J5-ext",
    "Snapshot CDC: diff two keyed table states into insert/update/"
    "delete change rows — the incremental feed when a source only "
    "provides full snapshots (Delta CDF's shape, from plain tables). "
    "One full-outer join on the key with null-safe value comparison; "
    "unchanged keys (the overwhelming majority at 100 TB) are dropped "
    "in the same stage, so the output is change-sized. The 'new' "
    "snapshot is derived deterministically (every 7th key deleted, "
    "every 13th re-priced by an exact-in-double +1000.00 (a x1.1 round lands on half-way floats the engines round apart)) so the expected diff is exact ground truth.",
    _CDC_ORACLE,
)
def x80_snapshot_cdc(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    old_snap = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    new_snap = (
        o.filter(F.col("o_orderkey") % 7 != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 13 == 0,
                F.col("o_totalprice") + 1000.0,
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    diff = snapshot_cdc(
        old_snap, new_snap, "o_orderkey", ["o_orderstatus", "o_totalprice"]
    )
    return diff.select(
        "op",
        "o_orderkey",
        F.col("old_o_orderstatus").alias("old_status"),
        F.col("old_o_totalprice").alias("old_price"),
        F.col("new_o_orderstatus").alias("new_status"),
        F.col("new_o_totalprice").alias("new_price"),
    ).orderBy("o_orderkey")
