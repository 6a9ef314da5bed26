"""Distributed global-ordering primitives == their single-partition
window equivalents, bit for bit, on data spread over many partitions.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import (
    global_ntile,
    global_row_number,
    global_running_sum,
)


def _df(spark, n=5000):
    # non-trivial value distribution with duplicates in `v`; `id` is
    # the unique tiebreaker
    return (
        spark.range(n)
        .repartition(16)
        .select(
            "id",
            (F.xxhash64("id") % 97).alias("v"),
        )
    )


def test_global_row_number_matches_window(spark):
    df = _df(spark)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, order, out="rn").collect()
    }
    exp = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == exp


def test_global_row_number_desc_order(spark):
    df = _df(spark, 1777)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, order, out="rn").collect()
    }
    exp = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("v"), F.asc("id"))),
        ).collect()
    }
    assert got == exp


def test_global_running_sum_matches_window(spark):
    df = _df(spark)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["run"]
        for r in global_running_sum(
            df, order, F.col("v").cast("long"), out="run"
        ).collect()
    }
    exp = {
        r["id"]: r["run"]
        for r in df.withColumn(
            "run",
            F.sum(F.col("v").cast("long")).over(
                Window.orderBy("v", "id").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        ).collect()
    }
    assert got == exp


def test_global_ntile_matches_window(spark):
    for n, k in [(5000, 7), (103, 10), (6, 10), (96, 4)]:
        df = _df(spark, n)
        order = [F.col("v").asc(), F.col("id").asc()]
        got = {
            r["id"]: r["t"]
            for r in global_ntile(df, order, k, out="t").collect()
        }
        exp = {
            r["id"]: r["t"]
            for r in df.withColumn(
                "t", F.ntile(k).over(Window.orderBy("v", "id"))
            ).collect()
        }
        assert got == exp, f"ntile mismatch at n={n} k={k}"


def test_global_row_number_plan_has_no_single_partition_exchange(spark):
    df = _df(spark)
    plan = (
        global_row_number(df, [F.col("v").asc(), F.col("id").asc()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the row-bearing path must be range-partitioned; the only windows
    # run over the per-partition count histogram (≤ numPartitions rows)
    assert "RangePartitioning" in plan or "rangepartitioning" in plan


def test_offset_histogram_reuses_range_exchange(spark):
    """The offset-histogram branch MUST read the same shuffle output
    as the row branch (identical range boundaries) — Spark's exchange
    reuse guarantees it; this pins that the reuse actually happens."""
    from pyspark.sql import functions as F

    df = (
        spark.range(50000)
        .repartition(8)
        .select("id", (F.xxhash64("id") % 997).alias("v"))
    )
    r = global_row_number(df, [F.col("v").asc(), F.col("id").asc()], "rn")
    r.collect()
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan
