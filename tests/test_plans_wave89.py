"""Eighty-ninth-wave tests: oracle parity plus invariants (confusion
totals, MCC range, band coverage, rate bounds)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave89
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_mcc", "q_discount_response", "q_return_rate_by_discount")


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


def test_mcc_structure(spark, sf_dir):
    r = wave89.a_mcc(spark, sf_dir).collect()[0]
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n_vecs
    assert -1.0 <= r["mcc"] <= 1.0


def test_discount_bands(spark, sf_dir):
    rows = wave89.q_discount_response(spark, sf_dir).collect()
    assert [r["band"] for r in rows] == list(range(0, 11))
    slopes = {r["qty_slope"] for r in rows}
    assert len(slopes) == 1
    for r in rows:
        assert r["mean_qty"] > 0


def test_return_rates_bounded(spark, sf_dir):
    rows = wave89.q_return_rate_by_discount(spark, sf_dir).collect()
    li_count = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r["n_lines"] for r in rows) == li_count
    for r in rows:
        assert 0.0 <= r["return_rate"] <= 1.0
        assert r["n_returned"] <= r["n_lines"]
