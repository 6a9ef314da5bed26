"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the difference between a sort-merge join with two full
shuffles and a bucketed join with none is the job; this test pins the
plan shape (no Exchange above either bucketed scan).
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # uses the default warehouse dir (./spark-warehouse, gitignored) —
    # spark.sql.warehouse.dir is static and cannot move per-test
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_bucketed")
    )
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(li_t).join(
            spark.table(o_t),
            spark.table(li_t).l_orderkey == spark.table(o_t).o_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() == spark.table(li_t).count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
