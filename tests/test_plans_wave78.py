"""Seventy-eighth-wave tests: oracle parity plus a numpy TwoNN
reference and Simpson-structure checks."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from idn_area_etl_spark.plans import all_specs, wave78
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_simpsons_check", "e_intrinsic_dimension")


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


def test_simpson_structure(spark, sf_dir):
    rows = wave78.a_simpsons_check(spark, sf_dir).collect()
    assert len(rows) == 5
    pooled = {r["pooled_beta"] for r in rows}
    assert len(pooled) == 1
    for r in rows:
        assert math.isfinite(r["seg_beta"])
        assert r["sign_reversal"] == (
            (r["seg_beta"] > 0) != (r["pooled_beta"] > 0)
        )


def test_twonn_matches_numpy(spark, sf_dir):
    r = wave78.e_intrinsic_dimension(spark, sf_dir).collect()[0]
    pdf = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    mat = np.array(
        [np.array(v, dtype=np.float64) for v in pdf["embedding"]]
    )
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / norms[:, None] / norms[None, :]
    d = np.round(1.0 - sims, 9)
    np.fill_diagonal(d, np.inf)
    # the r6 spec evaluates TwoNN on the fixed vec_id < 200 probe
    # sample (all-pairs over the full corpus is quadratic); neighbors
    # still range over every vector
    probe = pdf["vec_id"].to_numpy() < 200
    d = d[probe]
    d.sort(axis=1)
    d1, d2 = d[:, 0], d[:, 1]
    mask = d1 > 0
    want = mask.sum() / np.log(d2[mask] / d1[mask]).sum()
    assert r["n_used"] == int(mask.sum())
    assert r["twonn_id"] == pytest.approx(want, rel=1e-4)
    # a 64-dim isotropic cloud should report a substantial dimension
    assert r["twonn_id"] > 5
