"""Sixty-first-wave tests: oracle parity plus invariants (win-ratio
accounting, triple support dominated by pair support, dispersion
positive and distribution reconciles)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave61
from idn_area_etl_spark.plans.wave49 import q_seq_pattern_support
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_win_ratio", "q_seq_triple_support", "q_basket_dispersion")


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


def test_win_ratio_accounting(spark, sf_dir):
    r = wave61.a_win_ratio(spark, sf_dir).collect()[0]
    assert r["wins"] + r["losses"] <= r["n_pairs"]
    assert r["wins"] > 0 and r["losses"] > 0
    assert r["win_ratio"] == pytest.approx(
        r["wins"] / r["losses"], abs=1e-6
    )


def test_triple_support_dominated_by_pairs(spark, sf_dir):
    """Support of (a, b, c) can never exceed support of (a, c)."""
    triples = {
        (r["ta"], r["tb"], r["tc"]): r["support_users"]
        for r in wave61.q_seq_triple_support(spark, sf_dir).collect()
    }
    pairs = {
        (r["etype_a"], r["etype_b"]): r["support_users"]
        for r in q_seq_pattern_support(spark, sf_dir).collect()
    }
    assert triples
    for (a, b, c), sup in triples.items():
        assert sup <= pairs[(a, c)]
        assert sup <= pairs[(a, b)]


def test_basket_dispersion_structure(spark, sf_dir):
    rows = wave61.q_basket_dispersion(spark, sf_dir).collect()
    n_orders = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert sum(r["n_orders"] for r in rows) == n_orders
    disp = {r["dispersion_index"] for r in rows}
    assert len(disp) == 1
    assert disp.pop() > 0
