"""Ninety-first-wave tests: oracle parity plus invariants (EOQ
square-root law, LB vs numpy, coverage bounds)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from idn_area_etl_spark.plans import all_specs, wave91
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("q_eoq", "a_ljung_box", "d_test_ngram_coverage")


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
    specs = all_specs()
    for name in WAVE:
        assert name in specs
        assert specs[name].oracle is not None


@pytest.mark.parametrize("name", WAVE)
def test_matches_duckdb_oracle(spark, sf_dir, name):
    spec = all_specs()[name]
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


def test_eoq_sqrt_law(spark, sf_dir):
    rows = wave91.q_eoq(spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = math.sqrt(2 * r["annual_demand"] * 100 / 2)
        assert r["eoq"] == pytest.approx(want, rel=1e-4)
        assert r["annual_demand"] > 0


def test_ljung_box_matches_numpy(spark, sf_dir):
    r = wave91.a_ljung_box(spark, sf_dir).collect()[0]
    from pyspark.sql import functions as F

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("y"))
        .toPandas()
        .sort_values("day")
    )
    y = daily["y"].to_numpy()
    e = y - y.mean()
    n = len(e)
    c0 = float(e @ e)
    q = 0.0
    for k in range(1, 6):
        rk = float(e[k:] @ e[:-k]) / c0
        assert r[f"r{k}"] == pytest.approx(rk, abs=1e-4)
        q += rk * rk / (n - k)
    want = n * (n + 2) * q
    assert r["lb_q"] == pytest.approx(want, rel=1e-3)
    assert r["reject_whiteness"] == (r["lb_q"] > 11.0705)


def test_coverage_bounds(spark, sf_dir):
    rows = wave91.d_test_ngram_coverage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_covered"] <= r["n_test_grams"]
        assert 0.0 <= r["coverage"] <= 1.0
