"""applyInPandasWithState: per-key accumulator state must survive
micro-batch boundaries and converge to the batch aggregate."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.streaming.stateful import running_user_totals

SCHEMA = "user_id long, ts timestamp, value double"


@pytest.fixture(scope="module")
def chunked_stream_dir(spark, tmp_path_factory):
    """Two parquet files = two micro-batches (maxFilesPerTrigger=1),
    with user 1 active in both so its state must carry over."""
    path = tmp_path_factory.mktemp("statestream")
    batches = [
        [
            (1, datetime(2024, 1, 1, 10, 0), 1.0),
            (1, datetime(2024, 1, 1, 10, 1), 2.0),
            (2, datetime(2024, 1, 1, 10, 2), 10.0),
        ],
        [
            (1, datetime(2024, 1, 1, 11, 0), 4.0),
            (3, datetime(2024, 1, 1, 11, 1), 7.0),
        ],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(path / f"chunk_{i}")
        )
    return path


def test_state_survives_micro_batches(spark, chunked_stream_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{chunked_stream_dir}/chunk_*")
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM state_out").collect()
    # update mode emits once per touched user per batch; the LAST
    # emission per user is the running total → must equal the batch agg
    final: dict[int, tuple[int, float]] = {}
    for r in rows:  # memory sink appends in batch order
        final[r.user_id] = (r.n_events, r.total_value)
    assert final[1] == (3, 7.0)  # 2 events batch 1 + 1 event batch 2
    assert final[2] == (1, 10.0)
    assert final[3] == (1, 7.0)
    # user 1 must have been emitted twice (once per micro-batch)
    assert sum(1 for r in rows if r.user_id == 1) == 2
