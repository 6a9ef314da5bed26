"""Thirty-fourth-wave tests: oracle parity at sf0.001 plus
invariants — reconciliation partitioning, ABC ordering, trailing-mode
window correctness on a planted series."""

from __future__ import annotations

import math
from datetime import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.plans import all_specs, wave34
from idn_area_etl_spark.sources.tables import TABLE_NAMES, load_table

ORACLE_NAMES = [s.name for s in wave34.SPECS if s.oracle is not None]


def _norm(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "<null>" if math.isnan(v) else repr(v)
    return str(v)


def _canonical(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return (
        [cols[i] for i in order],
        sorted(tuple(_norm(r[i]) for i in order) for r in rows),
    )


def test_all_wave34_registered():
    specs = all_specs()
    for spec in wave34.SPECS:
        assert spec.name in specs


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_wave34_matches_duckdb_oracle(spark, sf_dir, name):
    spec = all_specs()[name]
    sdf = spec.builder(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rel = con.sql(spec.oracle)
    orows = rel.fetchall()
    s_cols, s_can = _canonical(srows, sdf.columns)
    o_cols, o_can = _canonical(orows, rel.columns)
    con.close()
    assert s_cols == o_cols
    assert s_can == o_can


def test_reconciliation_partitions_orders(spark, sf_dir):
    rows = {r["status"]: r["n_orders"] for r in wave34.q_order_reconciliation(spark, sf_dir).collect()}
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(rows.values()) == n_orders


def test_abc_classes_partition_and_order(spark, sf_dir):
    rows = {r["abc_class"]: r for r in wave34.q_abc_classification(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows.values()) == n_parts
    total = sum(r["class_revenue"] for r in rows.values())
    # A holds ~70% of revenue in FEWER parts than C holds the tail
    assert rows["A"]["class_revenue"] / total > 0.5
    if "C" in rows:
        assert (
            rows["A"]["class_revenue"] / rows["A"]["n_parts"]
            > rows["C"]["class_revenue"] / rows["C"]["n_parts"]
        )


def test_trailing_mode_planted_series(spark):
    # days 1-3 dominated by 'a'; days 4-10 'b' floods in. With a
    # 7-day trailing window the mode flips to 'b' once b's trailing
    # mass passes a's.
    rows = []
    eid = 0
    for d in range(1, 11):
        ts = datetime(2024, 1, d)
        n_a = 5 if d <= 3 else 1
        n_b = 0 if d <= 3 else 6
        for _ in range(n_a):
            rows.append((eid, ts, 1, "a", 1.0, "{}")); eid += 1
        for _ in range(n_b):
            rows.append((eid, ts, 1, "b", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.createOrReplaceTempView("events")
    # drive the same logic through a temp-table copy of the builder
    from pyspark.sql import Window

    day_counts = df.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count("*").alias("cnt")
    )
    day_num = F.datediff("day", F.lit("2020-01-01"))
    w_trail = (
        Window.partitionBy("event_type")
        .orderBy(day_num)
        .rangeBetween(-(wave34.MODE_WINDOW_DAYS - 1), 0)
    )
    trailing = day_counts.select(
        "day", "event_type", F.sum("cnt").over(w_trail).alias("trail_cnt")
    )
    w_rank = Window.partitionBy("day").orderBy(
        F.col("trail_cnt").desc(), "event_type"
    )
    out = {
        str(r["day"]): r["event_type"]
        for r in trailing.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert out["2024-01-03"] == "a"
    # by day 6: b has 3*6=18 trailing vs a's 3*5+3*1=18 → tie → 'a'
    # (lexicographic); by day 7 b=24 > a=16 → 'b'
    assert out["2024-01-06"] == "a"
    assert out["2024-01-07"] == "b"
    assert out["2024-01-10"] == "b"
