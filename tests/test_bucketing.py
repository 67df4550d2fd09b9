"""Bucketed co-located join: pre-bucketing both fact tables on the join
key eliminates the join-time shuffle — the Spark analog of co-located
MergeTree joins and the 100 TB answer to repeated fact⋈fact joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ravelytics_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "li"))  # external table (warehouse.dir is static)
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "o"))
        .saveAsTable("o_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    # disable auto-broadcast: at test SF the dim fits the threshold and
    # the planner rightly broadcasts; the bucketing payoff is the
    # fact⋈fact case where broadcast is impossible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_bucketed")
        o = spark.table("o_bucketed")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_linenumber", "o_orderdate"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # same result as the plain (shuffling) join
    plain = REGISTRY_J2 = (
        load_table(spark, sf_dir, "lineitem")
        .join(load_table(spark, sf_dir, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert joined.count() == plain


def test_disk_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """partitionBy on disk + a partition-key filter must prune at the
    file-listing level (PartitionFilters in the scan, partitionless
    directories never read) — the layout pattern for date-partitioned
    100 TB warehouses."""
    out = str(tmp_path / "orders_by_status")
    o = load_table(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)

    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1][:200]
    assert "o_orderstatus" in seg, f"partition filter not applied: {seg}"
    # pruned read returns exactly the partition's rows
    expected = o.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected
