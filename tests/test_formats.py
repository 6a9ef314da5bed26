"""Source/sink format breadth: the engine's tables round-trip through
every columnar/row format Spark ships (parquet, orc, json-lines, csv)
with values intact — the "switch a source format" capability a
pipeline user expects."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.sources.tables import load_table

SCHEMA = "n_nationkey long, n_name string, n_regionkey long"


@pytest.fixture(scope="module")
def nation_rows(spark, sf_dir):
    df = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, sf_dir, tmp_path_factory, nation_rows, fmt):
    path = str(tmp_path_factory.mktemp(f"rt_{fmt}"))
    df = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(path)

    reader = spark.read.format(fmt)
    if fmt in ("json", "csv"):
        reader = reader.schema(SCHEMA)
    if fmt == "csv":
        reader = reader.option("header", True)
    back = reader.load(path)
    assert sorted(tuple(r) for r in back.collect()) == nation_rows


def test_csv_sink_partition_pruned_read(spark, sf_dir, tmp_path_factory):
    """Partitioned parquet write + partition-pruned scan: the filter
    must reach the file listing, not just the row filter."""
    path = str(tmp_path_factory.mktemp("part"))
    df = load_table(spark, sf_dir, "nation")
    df.write.mode("overwrite").partitionBy("n_regionkey").parquet(path)
    pruned = spark.read.parquet(path).filter(F.col("n_regionkey") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    partition_filters = plan.split("PartitionFilters")[1].split("]")[0]
    assert "n_regionkey" in partition_filters, partition_filters
    expected = df.filter(F.col("n_regionkey") == 1).count()
    assert pruned.count() == expected
