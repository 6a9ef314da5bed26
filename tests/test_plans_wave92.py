"""Ninety-second-wave tests: oracle parity plus invariants (null
split balanced, ratio positive and clubs shrink)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave92
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_covariate_balance", "g_rich_club")


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


def test_null_split_reasonably_balanced(spark, sf_dir):
    """A fair md5 split should show small SMDs (|SMD| < 0.5 even at
    tiny n; the 0.1 'balanced' flag may legitimately vary)."""
    rows = wave92.a_covariate_balance(spark, sf_dir).collect()
    assert {r["covariate"] for r in rows} == {
        "pre_value",
        "n_events",
        "n_days",
    }
    for r in rows:
        assert abs(r["smd"]) < 0.5
        assert r["balanced"] == (abs(r["smd"]) < 0.1)


def test_rich_club_structure(spark, sf_dir):
    rows = wave92.g_rich_club(spark, sf_dir).collect()
    assert rows
    sizes = [r["n_club"] for r in rows]
    assert all(a >= b for a, b in zip(sizes, sizes[1:]))
    for r in rows:
        assert r["rich_club_ratio"] >= 0
        assert r["m_club"] <= r["n_club"] * (r["n_club"] - 1) // 2
