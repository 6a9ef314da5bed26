"""Streaming CDC upsert into a bucketed parquet state table.

The batch CDC operators (plans/wave6.py q_merge_upsert_latest,
plans/wave16.py q_cdc_tombstones) compact a *complete* change log.
This module maintains the same latest-wins-with-tombstones state
*incrementally* from an unbounded change stream, on plain parquet —
the engine-level MERGE INTO that table formats (Delta/Iceberg) ship,
expressed with Structured Streaming primitives:

- the state table is hash-bucketed by key (``bucket=<n>`` partition
  directories);
- each micro-batch touches ONLY the buckets containing changed keys:
  read-back is partition-pruned to those buckets, and the write uses
  dynamic partition overwrite, so an epoch rewrites O(changed
  buckets), not the whole table;
- recompute-per-bucket is idempotent (latest-wins by (seq, key) is
  deterministic), so checkpoint-driven epoch replay after a crash
  converges to the same state — the same sink-as-state recovery
  argument as micro_batch.py's first-seen province sink.

At 100 TB scale the bucket count bounds both rewrite amplification
(table_size / n_buckets per touched bucket) and parallelism; a real
deployment sizes buckets to ~100 MB-1 GB like any bucketed table.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: schema of a change row
CDC_SCHEMA = "key bigint, seq bigint, op string, payload string"


def compact_log(changes: DataFrame) -> DataFrame:
    """Keep only the highest-seq change per key — tombstones are
    RETAINED as rows.  The stored state must keep tombstones: with
    dynamic partition overwrite, a bucket whose last live row was
    deleted would otherwise produce zero output rows, never be
    rewritten, and resurrect the stale row."""
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def latest_wins(changes: DataFrame) -> DataFrame:
    """Compact a change set to live rows: highest seq per key wins;
    a winning 'delete' op removes the key (tombstone)."""
    return compact_log(changes).filter(F.col("op") != "delete")


def cdc_upsert_stream(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    checkpoint_path: str,
    n_buckets: int = 8,
) -> None:
    """Drain a bounded CDC change stream into the bucketed parquet
    state table at ``state_path`` (Trigger.AvailableNow)."""
    state_dir = Path(state_path)
    state_dir.mkdir(parents=True, exist_ok=True)

    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_path)
    )

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        spark_b = batch.sparkSession
        changes = batch.withColumn(
            "bucket", F.pmod(F.xxhash64("key"), F.lit(n_buckets))
        )
        touched = [
            r["bucket"]
            for r in changes.select("bucket").distinct().collect()
        ]
        if not touched:
            return
        has_state = any(
            p.name.startswith("bucket=") for p in state_dir.iterdir()
        )
        if has_state:
            current = (
                spark_b.read.schema(CDC_SCHEMA + ", bucket int")
                .option("basePath", str(state_dir))
                .parquet(str(state_dir))
                .filter(F.col("bucket").isin(touched))
            )
            merged = current.unionByName(changes)
        else:
            merged = changes
        compacted = compact_log(merged)
        (
            compacted.repartition(1, "bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(str(state_dir))
        )

    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Current live rows of the CDC state table."""
    return (
        spark.read.schema(CDC_SCHEMA + ", bucket int")
        .option("basePath", state_path)
        .parquet(state_path)
        .filter(F.col("op") != "delete")
        .drop("bucket")
    )
