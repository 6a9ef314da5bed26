"""Eighty-second-wave tests: oracle parity plus invariants (null ATT
small vs scale, curve monotone decreasing, chi2 shared)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave82
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = (
    "a_nn_matching_att",
    "d_jaccard_threshold_curve",
    "q_price_endings",
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


def test_matching_structure(spark, sf_dir):
    r = wave82.a_nn_matching_att(spark, sf_dir).collect()[0]
    assert r["n_matched"] > 0
    assert r["mean_match_distance"] >= 0
    assert math.isfinite(r["att"])


def test_threshold_curve_monotone(spark, sf_dir):
    rows = wave82.d_jaccard_threshold_curve(spark, sf_dir).collect()
    assert [r["tau"] for r in rows] == [0.5, 0.6, 0.7, 0.8, 0.9]
    counts = [r["n_pairs"] for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] > 0


def test_endings_shared_chi2(spark, sf_dir):
    rows = wave82.q_price_endings(spark, sf_dir).collect()
    assert len(rows) == 3
    chis = {r["chi2"] for r in rows}
    assert len(chis) == 1
    assert chis.pop() >= 0
    for r in rows:
        assert 0 <= r["cents"] <= 99
