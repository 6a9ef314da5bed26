"""Sixty-third-wave tests: oracle parity plus invariants (pooled SE
below the smallest single-site SE logic, reach disjointness, matrix
partitions parts)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave63
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_fixed_effect_meta", "g_two_hop_reach", "q_abc_xyz_matrix")


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


def test_meta_pool_structure(spark, sf_dir):
    r = wave63.a_fixed_effect_meta(spark, sf_dir).collect()[0]
    assert r["k_sites"] >= 2
    assert r["pooled_se"] > 0
    assert math.isfinite(r["pooled_effect"])


def test_two_hop_reach_disjoint(spark, sf_dir):
    rows = wave63.g_two_hop_reach(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_direct"] >= 1
        assert r["n_two_hop"] >= 0


def test_abc_xyz_partitions_parts(spark, sf_dir):
    rows = wave63.q_abc_xyz_matrix(spark, sf_dir).collect()
    n_parts = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r["n_parts"] for r in rows) == n_parts
    for r in rows:
        assert r["abc"] in {"A", "B", "C"}
        assert r["xyz"] in {"X", "Y", "Z"}
