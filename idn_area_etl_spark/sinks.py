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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of two
    non-negative int columns → one long whose sort order clusters
    2-D-close rows together.

    Sorting a write by this key makes parquet row-group min/max stats
    tight on *both* dimensions at once, so range predicates on either
    column skip row groups — multi-column data skipping, where
    single-key clustering only serves one column.  The bit interleave
    is unrolled at plan-build time into ``2*bits`` static shift/mask
    expressions (whole-stage-codegen'd; no UDF, no per-row loop).
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return z


def zvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """The DuckDB/ANSI twin of :func:`zvalue` (generated, same
    unrolled shift/mask form) — lets oracle SQL verify z-keys."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


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
