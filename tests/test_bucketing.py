"""Bucketed tables: co-located joins without a shuffle (the 100 TB
path for repeated joins on the same key).

Writes two tables bucketed+sorted on the join key and asserts the join
plan contains NO Exchange on either side — the physical property the
engine relies on when the same key joins repeatedly at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse_tables(spark, tmp_path):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    orders = spark.range(2000).select(
        F.col("id").alias("okey"), (F.col("id") % 5).alias("status")
    )
    lines = spark.range(8000).select(
        (F.col("id") % 2000).alias("okey"), (F.col("id") % 100).alias("qty")
    )
    (
        orders.write.bucketBy(8, "okey")
        .sortBy("okey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lines.write.bucketBy(8, "okey")
        .sortBy("okey")
        .mode("overwrite")
        .saveAsTable("b_lines")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


def test_bucketed_join_has_no_exchange(spark, warehouse_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lines").join(spark.table("b_orders"), "okey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
        # and the result is right
        assert joined.count() == 8000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_has_no_exchange(spark, warehouse_tables):
    agg = spark.table("b_lines").groupBy("okey").agg(F.sum("qty").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert agg.count() == 2000
