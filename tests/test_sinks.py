"""Partitioned parquet sink: layout, pruning, and clustering checks."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from idn_area_etl_spark.sinks import read_pruned, write_partitioned_parquet
from idn_area_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def partitioned_docs(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docs_part") / "documents")
    docs = load_table(spark, sf_dir, "documents")
    write_partitioned_parquet(
        docs, path, partition_by=["lang"], cluster_by=["n_chars"]
    )
    return path


def test_layout_is_hive_partitioned(spark, partitioned_docs, sf_dir):
    import os

    dirs = sorted(
        d for d in os.listdir(partitioned_docs) if d.startswith("lang=")
    )
    langs = sorted(
        r.lang
        for r in load_table(spark, sf_dir, "documents")
        .select("lang").distinct().collect()
    )
    assert dirs == [f"lang={lang}" for lang in langs]


def test_roundtrip_preserves_rows(spark, partitioned_docs, sf_dir):
    n_src = load_table(spark, sf_dir, "documents").count()
    assert spark.read.parquet(partitioned_docs).count() == n_src


def test_scan_prunes_partitions(spark, partitioned_docs):
    df = read_pruned(spark, partitioned_docs, lang="en")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    # the pruning predicate must be a partition filter, not a data filter
    assert "(lang" in plan.split("PartitionFilters")[1].split("]")[0]
    assert df.count() > 0
    assert df.select("lang").distinct().collect()[0].lang == "en"


def test_rows_clustered_within_files(spark, partitioned_docs):
    """sortWithinPartitions must leave each file internally ordered so
    row-group min/max stats are selective."""
    with_file = spark.read.parquet(partitioned_docs).withColumn(
        "f", F.input_file_name()
    )
    disordered = (
        with_file.withColumn(
            "prev",
            F.lag("n_chars").over(
                Window.partitionBy("f").orderBy(
                    F.monotonically_increasing_id()
                )
            ),
        )
        .filter(F.col("prev") > F.col("n_chars"))
        .count()
    )
    assert disordered == 0


def test_dynamic_partition_overwrite_is_idempotent(spark, tmp_path):
    """Re-running a day's batch with partitionOverwriteMode=dynamic
    replaces ONLY that day's partition — the exactly-once re-run
    story for batch backfills (other partitions untouched, no dups)."""
    path = str(tmp_path / "dynpart")
    df1 = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0),
         ("2024-01-02", 3, 30.0)],
        ["day", "id", "v"],
    )
    df1.write.partitionBy("day").parquet(path)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # re-run day 1 with corrected data (one row changed, one new)
        fix = spark.createDataFrame(
            [("2024-01-01", 1, 11.0), ("2024-01-01", 4, 40.0)],
            ["day", "id", "v"],
        )
        fix.write.mode("overwrite").partitionBy("day").parquet(path)
        # idempotence: running the same fix again changes nothing
        fix.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    out = {
        (str(r["day"]), r["id"]): r["v"]  # partition value inferred as DATE
        for r in spark.read.parquet(path).collect()
    }
    assert out == {
        ("2024-01-01", 1): 11.0,
        ("2024-01-01", 4): 40.0,
        ("2024-01-02", 3): 30.0,
    }
