"""Streaming CDC upsert: cross-batch latest-wins state on bucketed
parquet equals the batch compaction of the full log; tombstones
delete; restart with the same checkpoint resumes incrementally and
only touched buckets are rewritten."""

from __future__ import annotations

import os
import time
from pathlib import Path

from pyspark.sql import functions as F

from idn_area_etl_spark.streaming.cdc import (
    CDC_SCHEMA,
    cdc_upsert_stream,
    latest_wins,
    read_state,
)


def _write_chunk(spark, path: Path, rows, name: str) -> None:
    df = spark.createDataFrame(rows, CDC_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(path / "_tmp"))
    part = next((path / "_tmp").glob("part-*.parquet"))
    part.rename(path / name)
    for leftover in (path / "_tmp").iterdir():
        leftover.unlink()
    (path / "_tmp").rmdir()


def test_cdc_stream_equals_batch_compaction(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    state = tmp_path / "state"
    ckpt = str(tmp_path / "ckpt")

    batch1 = [
        (1, 1, "insert", "a1"),
        (2, 2, "insert", "b1"),
        (3, 3, "insert", "c1"),
    ]
    batch2 = [
        (1, 4, "update", "a2"),  # overrides a1
        (2, 5, "delete", ""),  # tombstone
        (4, 6, "insert", "d1"),
    ]
    _write_chunk(spark, inp, batch1, "chunk1.parquet")
    _write_chunk(spark, inp, batch2, "chunk2.parquet")

    cdc_upsert_stream(spark, str(inp), str(state), ckpt, n_buckets=4)

    got = sorted(
        (r["key"], r["seq"], r["payload"])
        for r in read_state(spark, str(state)).collect()
    )
    full_log = spark.createDataFrame(batch1 + batch2, CDC_SCHEMA)
    want = sorted(
        (r["key"], r["seq"], r["payload"])
        for r in latest_wins(full_log).collect()
    )
    assert got == want
    assert got == [(1, 4, "a2"), (3, 3, "c1"), (4, 6, "d1")]


def test_cdc_restart_resumes_and_prunes_buckets(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    state = tmp_path / "state"
    ckpt = str(tmp_path / "ckpt")

    # many keys spread over all buckets
    batch1 = [(k, k, "insert", f"v{k}") for k in range(1, 33)]
    _write_chunk(spark, inp, batch1, "chunk1.parquet")
    cdc_upsert_stream(spark, str(inp), str(state), ckpt, n_buckets=8)

    bucket_of_key1 = None
    mtimes_before: dict[str, float] = {}
    for d in Path(state).iterdir():
        if d.name.startswith("bucket="):
            files = sorted(p.name for p in d.glob("*.parquet"))
            mtimes_before[d.name] = max(
                p.stat().st_mtime for p in d.glob("*.parquet")
            )
            assert files, d
    n1 = (
        spark.createDataFrame([(1,)], "key bigint")
        .select(F.pmod(F.xxhash64("key"), F.lit(8)).alias("b"))
        .collect()[0]["b"]
    )
    bucket_of_key1 = f"bucket={n1}"

    time.sleep(1.1)  # make mtime deltas observable
    # second run, same checkpoint: only key 1 changes
    _write_chunk(spark, inp, [(1, 100, "update", "v1b")], "chunk2.parquet")
    cdc_upsert_stream(spark, str(inp), str(state), ckpt, n_buckets=8)

    got = {
        r["key"]: r["payload"]
        for r in read_state(spark, str(state)).collect()
    }
    assert got[1] == "v1b"
    assert len(got) == 32

    # untouched buckets were NOT rewritten (dynamic overwrite pruning)
    for d in Path(state).iterdir():
        if not d.name.startswith("bucket="):
            continue
        mtime = max(p.stat().st_mtime for p in d.glob("*.parquet"))
        if d.name == bucket_of_key1:
            assert mtime > mtimes_before[d.name]
        else:
            assert mtime == mtimes_before[d.name], d.name


def test_cdc_replayed_epoch_is_idempotent(spark, tmp_path):
    """Simulate a crash-replay: running the same bounded input against
    a FRESH checkpoint (so every epoch re-executes) leaves the state
    identical — per-bucket recompute is deterministic."""
    inp = tmp_path / "in"
    inp.mkdir()
    state = tmp_path / "state"

    rows = [(k, k, "insert", f"v{k}") for k in range(1, 9)] + [
        (3, 99, "delete", "")
    ]
    _write_chunk(spark, inp, rows[:4], "chunk1.parquet")
    _write_chunk(spark, inp, rows[4:], "chunk2.parquet")

    cdc_upsert_stream(
        spark, str(inp), str(state), str(tmp_path / "ck1"), n_buckets=4
    )
    first = sorted(
        tuple(r) for r in read_state(spark, str(state)).collect()
    )
    # replay everything from scratch into the same state dir
    cdc_upsert_stream(
        spark, str(inp), str(state), str(tmp_path / "ck2"), n_buckets=4
    )
    second = sorted(
        tuple(r) for r in read_state(spark, str(state)).collect()
    )
    assert first == second
    assert all(k != 3 for k, *_ in first)
