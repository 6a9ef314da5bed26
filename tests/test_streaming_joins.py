"""Stream-stream watermarked interval join, driven synchronously over
bounded file input, checked against the identical batch join."""

from __future__ import annotations

from datetime import datetime

import pytest

from idn_area_etl_spark.streaming.joins import attribution_join

SCHEMA = "user_id long, ts timestamp, value double"


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    clicks = [
        (1, datetime(2024, 1, 1, 10, 0, 0), 0.1),
        (1, datetime(2024, 1, 1, 10, 50, 0), 0.2),
        (2, datetime(2024, 1, 1, 10, 5, 0), 0.3),
        (3, datetime(2024, 1, 1, 9, 0, 0), 0.4),   # too early for any purchase
    ]
    purchases = [
        (1, datetime(2024, 1, 1, 11, 0, 0), 100.0),  # catches 10:50 click only
        (2, datetime(2024, 1, 1, 10, 20, 0), 50.0),  # catches 10:05 click
        (3, datetime(2024, 1, 1, 12, 0, 0), 70.0),   # no click in window
    ]
    c_path = str(tmp_path_factory.mktemp("clicks"))
    p_path = str(tmp_path_factory.mktemp("purchases"))
    spark.createDataFrame(clicks, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(c_path)
    spark.createDataFrame(purchases, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(p_path)
    return c_path, p_path


def _expected():
    return {
        (1, datetime(2024, 1, 1, 11, 0, 0), datetime(2024, 1, 1, 10, 50, 0)),
        (2, datetime(2024, 1, 1, 10, 20, 0), datetime(2024, 1, 1, 10, 5, 0)),
    }


def test_stream_stream_interval_join(spark, stream_dirs):
    c_path, p_path = stream_dirs
    clicks = spark.readStream.schema(SCHEMA).parquet(c_path)
    purchases = spark.readStream.schema(SCHEMA).parquet(p_path)
    joined = attribution_join(clicks, purchases, max_delay="30 minutes")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.purchase_ts, r.click_ts)
        for r in spark.sql("SELECT * FROM attr_out").collect()
    }
    assert got == _expected()


def test_batch_parity_of_attribution_join(spark, stream_dirs):
    """The same operator on batch inputs returns the same pairs."""
    c_path, p_path = stream_dirs
    joined = attribution_join(
        spark.read.parquet(c_path), spark.read.parquet(p_path)
    )
    got = {
        (r.user_id, r.purchase_ts, r.click_ts) for r in joined.collect()
    }
    assert got == _expected()
