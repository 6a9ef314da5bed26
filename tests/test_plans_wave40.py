"""Fortieth-wave tests: PIT join oracle parity plus leakage-freedom
on a planted timeline."""

from __future__ import annotations

import math
from datetime import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.joins import asof_join
from idn_area_etl_spark.plans import all_specs, wave40
from idn_area_etl_spark.sources.tables import TABLE_NAMES


def _norm(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "<null>" if math.isnan(v) else repr(v)
    return str(v)


def _canonical(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return (
        [cols[i] for i in order],
        sorted(tuple(_norm(r[i]) for i in order) for r in rows),
    )


def test_registered():
    assert "j_point_in_time" in all_specs()


def test_pit_matches_duckdb_oracle(spark, sf_dir):
    spec = all_specs()["j_point_in_time"]
    sdf = spec.builder(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rel = con.sql(spec.oracle)
    orows = rel.fetchall()
    s_cols, s_can = _canonical(srows, sdf.columns)
    o_cols, o_can = _canonical(orows, rel.columns)
    con.close()
    assert s_cols == o_cols
    assert s_can == o_can


def test_pit_no_leakage_planted(spark):
    """An event BEFORE a dimension version can never pick it up —
    the leakage-freedom property PIT joins exist for."""
    dim = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 10), "v1"),
            (1, datetime(2024, 1, 20), "v2"),
        ],
        ["key", "vts", "val"],
    )
    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 5), 100),   # before any version
            (1, datetime(2024, 1, 10), 101),  # exactly at v1
            (1, datetime(2024, 1, 15), 102),  # inside v1
            (1, datetime(2024, 1, 25), 103),  # inside v2
        ],
        ["key", "ts", "event_id"],
    )
    out = {
        r["event_id"]: r["asof_val"]
        for r in asof_join(
            ev, dim, key="key", left_ts="ts", right_ts="vts",
            payload_cols=["val"],
        ).collect()
    }
    assert out == {100: None, 101: "v1", 102: "v1", 103: "v2"}
