"""Seventy-third-wave tests: oracle parity plus invariants
(burstiness in (-1, 1), catalog curve monotone and complete, churn
flags bounded)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave73
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = (
    "d_interarrival_burstiness",
    "q_catalog_growth",
    "q_churn_risk_flags",
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


def test_burstiness_range(spark, sf_dir):
    rows = wave73.d_interarrival_burstiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 < r["mean_burstiness"] < 1.0
        assert r["n_users"] > 0


def test_catalog_growth_monotone_complete(spark, sf_dir):
    rows = wave73.q_catalog_growth(spark, sf_dir).collect()
    sizes = [r["catalog_size"] for r in rows]
    assert all(a < b for a, b in zip(sizes, sizes[1:]))
    n_parts = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sizes[-1] == n_parts
    assert sum(r["new_parts"] for r in rows) == n_parts


def test_churn_flags_bounded(spark, sf_dir):
    rows = wave73.q_churn_risk_flags(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_at_risk"] <= r["n_users"]
