"""Eighty-fifth-wave tests: oracle parity plus invariants (rank-
biserial in [-1,1], hockey shares bounded, cluster split leaks
NOTHING)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave85
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_rank_biserial", "q_quarter_hockey", "s_cluster_aware_split")


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


def test_rank_biserial_range(spark, sf_dir):
    r = wave85.a_rank_biserial(spark, sf_dir).collect()[0]
    assert -1.0 <= r["rank_biserial"] <= 1.0
    assert 0 <= r["u_stat"] <= r["n_treat"] * r["n_control"]


def test_hockey_shares_bounded(spark, sf_dir):
    rows = wave85.q_quarter_hockey(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["final_month_share"] <= 1.0
        assert r["q_rev"] > 0


def test_cluster_split_zero_leakage(spark, sf_dir):
    r = wave85.s_cluster_aware_split(spark, sf_dir).collect()[0]
    assert r["n_near_dup_pairs"] > 0
    assert r["cluster_cross_pairs"] == 0  # the whole point
    assert 0 <= r["naive_cross_pairs"] <= r["n_near_dup_pairs"]
