"""Bucketing: co-located fact joins must not shuffle.

At 100 TB, a fact-fact join you run every day should read from tables
bucketed on the join key — Spark then sort-merge-joins bucket-to-bucket
with NO Exchange on either side. This test proves the engine's layout
actually buys that plan."""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(tmp_path / "b_orders"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        cust.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(tmp_path / "b_cust"))
        .mode("overwrite")
        .saveAsTable("b_cust")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        c = spark.table("b_cust")
        joined = o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "c_custkey", "o_totalprice"
        )
        n = joined.count()
        assert n > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
