"""Ninetieth-wave tests: oracle parity plus invariants (balanced
after-counts, BF t finite, profile monotone)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave90
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("s_oversample_minority", "a_brown_forsythe", "g_threshold_profile")


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


def test_oversample_balances(spark, sf_dir):
    rows = wave90.s_oversample_minority(spark, sf_dir).collect()
    mx = max(r["n"] for r in rows)
    for r in rows:
        assert r["n_after"] == r["n"] * r["replication"]
        # replication is the minimal factor reaching the majority
        assert r["n_after"] >= mx
        assert r["n"] * (r["replication"] - 1) < mx
    majority = [r for r in rows if r["n"] == mx]
    assert all(r["replication"] == 1 for r in majority)


def test_bf_structure(spark, sf_dir):
    r = wave90.a_brown_forsythe(spark, sf_dir).collect()[0]
    assert r["mean_absdev_control"] > 0
    assert r["mean_absdev_treat"] > 0
    assert math.isfinite(r["bf_t"])


def test_profile_monotone(spark, sf_dir):
    rows = wave90.g_threshold_profile(spark, sf_dir).collect()
    assert [r["floor"] for r in rows] == [1, 2, 3, 4, 5]
    edges = [r["n_edges"] for r in rows]
    nodes = [r["n_nodes"] for r in rows]
    assert all(a >= b for a, b in zip(edges, edges[1:]))
    assert all(a >= b for a, b in zip(nodes, nodes[1:]))
    for r in rows:
        assert 0.0 <= r["density"] <= 1.0
