"""Seventy-sixth-wave tests: oracle parity plus invariants (repeat
bounds, Oaxaca identity, alpha vs numpy)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from idn_area_etl_spark.plans import all_specs, wave76
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = (
    "q_repeat_purchase_rate",
    "a_cronbach_alpha",
    "a_oaxaca_decomposition",
)


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


def test_repeat_rate_bounds(spark, sf_dir):
    rows = wave76.q_repeat_purchase_rate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_repeat"] <= r["n_buyers"]
        assert 0.0 <= r["repeat_rate"] <= 1.0


def test_alpha_matches_numpy(spark, sf_dir):
    r = wave76.a_cronbach_alpha(spark, sf_dir).collect()[0]
    pdf = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    mat = np.array(
        [np.array(v[:5], dtype=np.float64) for v in pdf["embedding"]]
    )
    item_vars = mat.var(axis=0, ddof=1).sum()
    tot_var = mat.sum(axis=1).var(ddof=1)
    want = (5 / 4) * (1 - item_vars / tot_var)
    assert r["cronbach_alpha"] == pytest.approx(want, abs=1e-5)


def test_oaxaca_identity(spark, sf_dir):
    r = wave76.a_oaxaca_decomposition(spark, sf_dir).collect()[0]
    assert r["mean_gap"] == pytest.approx(
        r["explained_endowments"] + r["unexplained"], abs=2e-6
    )
    assert r["beta_rest"] > 0  # more orders -> more spend
    assert r["beta_building"] > 0
