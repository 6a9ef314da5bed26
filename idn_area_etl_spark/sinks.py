"""Scale-mode columnar sinks: partitioned + clustered parquet layout.

The reference's only sink is per-entity CSV (writer.py there, ours in
idn_area_etl_spark/writer.py).  A 100 TB corpus wants a layout that
downstream scans can prune:

- **Hive partitioning** on a low-cardinality routing column (e.g.
  ``lang``) → partition pruning: a ``lang = 'en'`` scan never opens
  other directories (``PartitionFilters`` in the plan).
- **Range clustering** within partitions on a sort column →
  parquet row-group min/max stats become selective, so point/range
  predicates skip row groups (the poor man's Z-order for a single
  key).
- ``maxRecordsPerFile`` bounds file sizes so a single writer task
  can't emit a multi-GB file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    cluster_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write a Hive-partitioned, optionally range-clustered parquet
    dataset.

    ``repartition(partition_by)`` routes each output partition's rows
    to one task (instead of every task writing every partition —
    files = tasks × partitions otherwise); ``sortWithinPartitions``
    orders rows so row-group stats are tight on ``cluster_by``.
    """
    out = df.repartition(*[df[c] for c in partition_by])
    if cluster_by:
        # sort key must be prefixed by the partition columns: the file
        # writer requires partition-column ordering and would re-sort
        # (destroying the clustering) if the prefix didn't match
        out = out.sortWithinPartitions(*partition_by, *cluster_by)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_pruned(
    spark: SparkSession, path: str, **partition_equals: str
) -> DataFrame:
    """Read back with partition-pruning predicates (`col = value` per
    keyword arg).  The returned plan's scan carries PartitionFilters —
    non-matching directories are never listed into tasks."""
    df = spark.read.parquet(path)
    for col, value in partition_equals.items():
        df = df.filter(df[col] == value)
    return df
