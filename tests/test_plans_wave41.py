"""Forty-first-wave tests: oracle parity at sf0.001 plus k-center
greedy invariants (coverage radius non-increasing, brute-force round
verification) and anomaly-flag bound."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.plans import all_specs, wave41
from idn_area_etl_spark.sources.tables import TABLE_NAMES, load_table

ORACLE_NAMES = [s.name for s in wave41.SPECS if s.oracle is not None]


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


def test_all_wave41_registered():
    specs = all_specs()
    for spec in wave41.SPECS:
        assert spec.name in specs


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_wave41_matches_duckdb_oracle(spark, sf_dir, name):
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


def test_kcenter_matches_numpy_greedy(spark, sf_dir):
    rows = wave41.s_kcenter_coreset(spark, sf_dir).collect()
    mat = np.array(
        load_table(spark, sf_dir, "embeddings")
        .orderBy("vec_id")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    selected = [0]
    expect = [(0, 0, 0.0)]
    for rnd in range(1, wave41.CORESET_K):
        d = np.full(len(mat), np.inf)
        for s in selected:
            d = np.minimum(
                d, np.round(np.sqrt(((mat - mat[s]) ** 2).sum(axis=1)), 9)
            )
        d[selected] = -np.inf
        best = int(np.lexsort((np.arange(len(mat)), -d))[0])
        expect.append((rnd, best, float(d[best])))
        selected.append(best)
    got = [(r["round"], r["vec_id"], r["coverage_radius"]) for r in rows]
    assert [g[:2] for g in got] == [e[:2] for e in expect]
    for g, e in zip(got[1:], expect[1:]):
        assert abs(g[2] - e[2]) < 1e-6
    # greedy k-center: coverage radius non-increasing after round 1
    radii = [g[2] for g in got[1:]]
    assert all(b <= a + 1e-9 for a, b in zip(radii, radii[1:]))


def test_anomaly_flags_are_extreme(spark, sf_dir):
    rows = wave41.q_seasonal_anomaly(spark, sf_dir).collect()
    for r in rows:
        assert abs(r["z"]) > wave41.ANOM_Z
