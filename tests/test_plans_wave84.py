"""Eighty-fourth-wave tests: oracle parity plus invariants (vintage
partition, Benford probabilities sum to 1, matched histogram
dominance)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave84
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("q_vintage_analysis", "a_benford_second", "s_length_matched_sample")


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


def test_vintage_partitions_customers(spark, sf_dir):
    rows = wave84.q_vintage_analysis(spark, sf_dir).collect()
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    slopes = {r["trend_slope"] for r in rows}
    assert len(slopes) == 1


def test_benford_second_law(spark, sf_dir):
    assert abs(sum(wave84._BENFORD2) - 1.0) < 1e-9
    rows = wave84.a_benford_second(spark, sf_dir).collect()
    assert len(rows) == 10
    assert abs(sum(r["observed"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r["chi2_term"] >= 0


def test_matched_sample_dominance(spark, sf_dir):
    rows = wave84.s_length_matched_sample(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] == min(r["n_en"], r["n_zh"])
        assert r["n_kept"] <= r["n_en"]
