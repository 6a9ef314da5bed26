"""Seventy-first-wave tests: oracle parity plus the growth-accounting
identity, Hill positivity, and overlap bounds."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave71
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("q_growth_accounting", "a_hill_tail_index", "d_vocab_overlap")


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


def test_growth_accounting_identity(spark, sf_dir):
    rows = wave71.q_growth_accounting(spark, sf_dir).collect()
    assert rows
    for i, r in enumerate(rows):
        assert (
            r["actives"] == r["new"] + r["retained"] + r["resurrected"]
        )
        if i > 0:
            prev = rows[i - 1]
            # everyone active last week is either retained or churned
            assert r["retained"] + r["churned"] == prev["actives"]
    assert rows[0]["new"] == rows[0]["actives"]  # first week: all new


def test_hill_positive(spark, sf_dir):
    r = wave71.a_hill_tail_index(spark, sf_dir).collect()[0]
    assert r["k"] == 100
    assert r["mean_log_excess"] > 0
    assert r["hill_alpha"] > 0
    assert r["hill_alpha"] == pytest.approx(
        1.0 / r["mean_log_excess"], rel=1e-4
    )


def test_overlap_bounds(spark, sf_dir):
    rows = wave71.d_vocab_overlap(spark, sf_dir).collect()
    assert len(rows) == 10  # 5 choose 2
    for r in rows:
        assert 0.0 < r["overlap_coef"] <= 1.0
        assert r["ninter"] >= 1
