"""Seventy-fifth-wave tests: oracle parity plus invariants (BH
discovery prefix property, evenness range, range-frame symmetry)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave75
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_bh_fdr", "d_source_evenness", "w_price_range_frame")


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


def test_bh_discovery_prefix(spark, sf_dir):
    """BH discoveries are exactly the rank prefix up to the largest
    passing index — never a gap."""
    rows = wave75.a_bh_fdr(spark, sf_dir).collect()
    assert len(rows) == 25
    flags = [r["discovery"] for r in rows]  # ordered by rnk
    if any(flags):
        last_true = max(i for i, f in enumerate(flags) if f)
        assert all(flags[: last_true + 1])
        assert not any(flags[last_true + 1 :])
    zs = [r["abs_z"] for r in rows]
    assert all(a >= b for a, b in zip(zs, zs[1:]))


def test_evenness_range(spark, sf_dir):
    rows = wave75.d_source_evenness(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r["evenness"] <= 1.0 + 1e-9


def test_range_frame_counts(spark, sf_dir):
    rows = wave75.w_price_range_frame(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_within_1000"] >= 1  # at least itself
