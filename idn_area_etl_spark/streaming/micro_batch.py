"""Structured-Streaming expression of the reference's chunk loop.

The reference processes a PDF as a bounded stream of page chunks with
run-global state (SURVEY.md §2.9): writers stay open across chunks,
and ``_seen_provinces`` dedups provinces across the whole run
(extractors.py:110-112).  Spark equivalents:

- **micro-batch executor**: ``readStream`` over the long-form raw
  rows + ``foreachBatch`` running the same batch extraction dataflow
  per chunk, appending to per-entity parquet sinks
  (``Trigger.AvailableNow`` ≙ "drain the bounded input").
- **cross-batch first-seen state**: the province sink itself is the
  state — each batch anti-joins the already-written codes before
  appending (exactly the semantics of the reference's in-memory set,
  but restart-safe because the state lives in the sink).
- a pure-streaming variant (:func:`streaming_first_seen_provinces`)
  uses ``dropDuplicates`` state for engines that want
  exactly-once streaming dedup without a sink read-back.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.registry import extract_all
from idn_area_etl_spark.sources.raw import RAW_TABLE_SCHEMA

ENTITIES = ["province", "regency", "district", "village", "island"]


def run_micro_batch_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str | None = None,
) -> dict[str, int]:
    """Drain a bounded raw-rows stream through the extraction dataflow.

    ``input_path``: directory of parquet files with RAW_TABLE_SCHEMA —
    each arriving file plays the role of one page-chunk.  Entity
    outputs land under ``output_path/<entity>`` as append-mode parquet.
    Returns final per-entity row counts.
    """
    out_dir = Path(output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    checkpoint = checkpoint_path or str(out_dir / "_checkpoint")

    stream = (
        spark.readStream.schema(RAW_TABLE_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one chunk per micro-batch
        .parquet(input_path)
    )

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        entities = extract_all(batch)
        for name in ENTITIES:
            df = entities[name]
            target = str(out_dir / name)
            if name == "province":
                # cross-batch first-seen: codes already in the sink win
                # (reference _seen_provinces semantics, restart-safe)
                try:
                    seen = batch.sparkSession.read.parquet(target).select("code")
                    df = df.join(seen, "code", "left_anti")
                except Exception:  # noqa: BLE001 - sink not created yet
                    pass
            df.write.mode("append").parquet(target)

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    counts: dict[str, int] = {}
    for name in ENTITIES:
        target = str(out_dir / name)
        try:
            counts[name] = spark.read.parquet(target).count()
        except Exception:  # noqa: BLE001 - zero-output entity
            counts[name] = 0
    return counts


def streaming_first_seen_provinces(raw_stream: DataFrame) -> DataFrame:
    """Pure-streaming stateful first-seen dedup of province codes.

    ``dropDuplicates`` keeps per-key state across micro-batches — the
    streaming twin of A1.  Key space is tiny (≤ ~40 provinces), so
    unbounded state is safe (SURVEY.md §2.9).

    Note: table classification needs per-table aggregation, which
    append-mode streams restrict; this variant applies the row-shape
    heuristic (code col 0, name col 1, data rows only) — the
    foreachBatch pipeline above is the full-fidelity path.
    """
    code = F.trim(F.get("cells", 0))
    name = F.trim(F.get("cells", 1))
    return (
        raw_stream.filter(F.col("row_no") >= 2)
        .select("page_no", "table_no", "row_no",
                code.alias("code"), name.alias("name"))
        .filter((F.length("code") == 2) & (F.col("name") != ""))
        .dropDuplicates(["code"])
    )
