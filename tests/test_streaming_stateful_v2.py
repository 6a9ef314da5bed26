"""transformWithStateInPandas: typed ValueState + MapState must
survive micro-batch boundaries and converge to the batch aggregate.

Environment gate: the transformWithState runtime speaks protobuf to
the state server; containers without ``google.protobuf`` can't run it
(no installs allowed here), so the whole module skips — the
``applyInPandasWithState`` twin in test_streaming_stateful.py stays
the always-on stateful coverage."""

from __future__ import annotations

from datetime import datetime

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithState requires protobuf, absent in this container",
)

from idn_area_etl_spark.streaming.stateful_v2 import running_user_profiles  # noqa: E402

SCHEMA = "user_id long, ts timestamp, value double, event_type string"


@pytest.fixture(scope="module")
def chunked_stream_dir(spark, tmp_path_factory):
    """Two parquet files = two micro-batches (maxFilesPerTrigger=1);
    user 1 appears in both with overlapping AND new event types, so
    both the value state and the map state must carry over."""
    path = tmp_path_factory.mktemp("statestream_v2")
    batches = [
        [
            (1, datetime(2024, 1, 1, 10, 0), 1.0, "click"),
            (1, datetime(2024, 1, 1, 10, 1), 2.0, "view"),
            (2, datetime(2024, 1, 1, 10, 2), 10.0, "click"),
        ],
        [
            (1, datetime(2024, 1, 1, 11, 0), 4.0, "click"),
            (1, datetime(2024, 1, 1, 11, 1), 8.0, "purchase"),
            (3, datetime(2024, 1, 1, 11, 2), 7.0, "view"),
        ],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(path / f"chunk_{i}")
        )
    return path


def test_typed_state_survives_micro_batches(spark, chunked_stream_dir, tmp_path):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{chunked_stream_dir}/chunk_*")
    )
    q = (
        running_user_profiles(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_v2_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM state_v2_out").collect()
    final: dict[int, tuple[int, float, int]] = {}
    for r in rows:  # memory sink appends in batch order
        final[r.user_id] = (r.n_events, r.total_value, r.n_event_types)
    # user 1: 2 events batch1 + 2 events batch2; click repeats, so
    # distinct types = {click, view, purchase}
    assert final[1] == (4, 15.0, 3)
    assert final[2] == (1, 10.0, 1)
    assert final[3] == (1, 7.0, 1)
