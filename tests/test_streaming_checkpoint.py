"""Streaming state recovery: dedup state must survive a query restart
through the checkpoint — the property that makes exactly-once
cross-batch dedup possible on a real cluster (executors die, queries
restart, state lives in the checkpoint, not the process)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return str(src), str(tmp_path / "ckpt"), str(tmp_path / "out")


def _run_once(spark, src_dir, ckpt_dir, out_dir):
    stream = (
        spark.readStream.schema("code string, name string").json(src_dir)
    )
    deduped = stream.dropDuplicates(["code"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [r.code for r in spark.read.parquet(out_dir).collect()]


def test_dedup_state_survives_restart(spark, dirs):
    src, ckpt, out = dirs
    with open(f"{src}/batch1.json", "w") as f:
        f.write('{"code": "11", "name": "Aceh"}\n')
        f.write('{"code": "12", "name": "Sumut"}\n')
    first = _run_once(spark, src, ckpt, out)
    assert sorted(first) == ["11", "12"]

    # new file arrives AFTER the first query fully stopped; "12" is a
    # duplicate that only the checkpointed state store can know about
    with open(f"{src}/batch2.json", "w") as f:
        f.write('{"code": "12", "name": "Sumut DUPLICATE"}\n')
        f.write('{"code": "13", "name": "Sumbar"}\n')
    second = _run_once(spark, src, ckpt, out)
    # the restarted query appended only the genuinely-new code: state
    # recovery filtered the cross-restart duplicate
    assert sorted(second) == ["11", "12", "13"]
    assert second.count("12") == 1
