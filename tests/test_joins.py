"""As-of and range join operator tests on hand-built frames."""

from __future__ import annotations

from datetime import datetime

from idn_area_etl_spark.operators.joins import asof_join, range_join_within


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:30"), "L1"),
            (1, ts("2024-01-01 10:02:00"), "L2"),
            (1, ts("2024-01-01 09:00:00"), "L0"),   # before any right row
            (2, ts("2024-01-01 10:00:00"), "L3"),   # exact-equal ts match
        ],
        "k int, lts timestamp, ltag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 100),
            (1, ts("2024-01-01 10:01:00"), 101),
            (2, ts("2024-01-01 10:00:00"), 200),
        ],
        "k int, rts timestamp, rv int",
    )
    out = {
        r["ltag"]: r["asof_rv"]
        for r in asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            payload_cols=["rv"],
        ).collect()
    }
    assert out == {"L0": None, "L1": 100, "L2": 101, "L3": 200}


def test_range_join_within(spark):
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-01 10:00:00"))],
        "k int, a_id int, a_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 20, ts("2024-01-01 10:00:30")),   # +30s  -> in
            (1, 21, ts("2024-01-01 10:01:00")),   # +60s  -> in (inclusive)
            (1, 22, ts("2024-01-01 10:01:01")),   # +61s  -> out
            (1, 23, ts("2024-01-01 09:59:59")),   # -1s   -> out (one-sided)
            (2, 24, ts("2024-01-01 10:00:10")),   # other key -> out
        ],
        "k int, b_id int, b_ts timestamp",
    )
    got = sorted(
        r["b_id"]
        for r in range_join_within(
            left, right, key="k", left_ts="a_ts", right_ts="b_ts",
            max_gap_seconds=60,
        ).collect()
    )
    assert got == [20, 21]
