"""Eighty-eighth-wave tests: oracle parity plus invariants (z mean
near zero across days, correlation bounds + numpy cross-check)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from idn_area_etl_spark.plans import all_specs, wave88
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_xbar_control", "e_dim_correlation_top")


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


def test_xbar_chart_structure(spark, sf_dir):
    rows = wave88.a_xbar_control(spark, sf_dir).collect()
    assert len(rows) == 30
    zs = [r["z"] for r in rows]
    # in-control process: day means scatter around the grand mean
    assert abs(sum(zs) / len(zs)) < 1.5
    for r in rows:
        assert r["out_of_control"] == (abs(r["z"]) > 3.0)


def test_dim_corr_matches_numpy(spark, sf_dir):
    rows = wave88.e_dim_correlation_top(spark, sf_dir).collect()
    assert len(rows) == 5
    pdf = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    mat = np.array(
        [np.array(v, dtype=np.float64) for v in pdf["embedding"]]
    )
    cm = np.corrcoef(mat.T)
    for r in rows:
        assert -1.0 <= r["corr"] <= 1.0
        want = cm[r["d1"], r["d2"]]
        assert r["corr"] == pytest.approx(want, abs=1e-5)
    abss = [abs(r["corr"]) for r in rows]
    assert all(a >= b for a, b in zip(abss, abss[1:]))
