"""Structured Streaming: watermarked windowed aggregation and
session windows driven synchronously over bounded parquet input."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("evstream"))
    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), "click", 1.0),
        (1, datetime(2024, 1, 1, 10, 2, 0), "click", 2.0),
        (2, datetime(2024, 1, 1, 10, 4, 0), "view", 3.0),
        (1, datetime(2024, 1, 1, 11, 0, 0), "click", 4.0),
        (2, datetime(2024, 1, 1, 11, 30, 0), "view", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_watermarked_tumbling_window(spark, event_stream_dir):
    schema = "user_id long, ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r["window"]["start"].hour, r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert rows[(10, "click")] == (2, 3.0)
    assert rows[(10, "view")] == (1, 3.0)
    assert rows[(11, "click")] == (1, 4.0)
    assert rows[(11, "view")] == (1, 5.0)


def test_streaming_session_window(spark, event_stream_dir):
    schema = "user_id long, ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sessions = sorted(
        (r["user_id"], r["n"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    )
    # user 1: (10:00,10:02) one session + 11:00 alone; user 2: two singles
    assert sessions == [(1, 1), (1, 2), (2, 1), (2, 1)]


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """`dropDuplicatesWithinWatermark` (Spark 3.5+): duplicates whose
    event times differ but fall inside the watermark delay collapse to
    one row; state for expired keys is dropped (unlike unbounded
    dropDuplicates, the 100 TB-stream-safe variant)."""
    from datetime import datetime

    path = str(tmp_path / "dupstream")
    rows = [
        (100, datetime(2024, 1, 1, 10, 0, 0), "click"),
        (100, datetime(2024, 1, 1, 10, 3, 0), "click"),   # dup, within delay
        (101, datetime(2024, 1, 1, 10, 1, 0), "view"),
        (101, datetime(2024, 1, 1, 10, 2, 0), "view"),    # dup, within delay
        (102, datetime(2024, 1, 1, 12, 0, 0), "click"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string"
    ).parquet(path)
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_wm_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(
        "SELECT event_id, COUNT(*) AS n FROM dedup_wm_out GROUP BY event_id"
    ).collect()
    counts = {r["event_id"]: r["n"] for r in out}
    assert counts == {100: 1, 101: 1, 102: 1}
