"""Forty-fifth-wave tests: oracle parity plus semantic invariants
(hard negatives never share the query label; coverage bounded by
event count x window)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave45
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = (
    "e_hard_negatives",
    "q_l_diversity",
    "q_interval_coverage",
    "d_source_overlap",
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


def test_hard_negatives_cross_label_only(spark, sf_dir):
    rows = wave45.e_hard_negatives(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["query_label"] != r["neighbor_label"]
        assert 1 <= r["rnk"] <= 3
        assert -1.0 <= r["cosine"] <= 1.0


def test_interval_coverage_bounds(spark, sf_dir):
    rows = wave45.q_interval_coverage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # each island is at least one window long; coverage can never
        # exceed n_events stacked windows
        assert r["covered_us"] >= r["n_islands"] * 300_000_000
        assert r["covered_us"] <= r["n_events"] * 300_000_000
        assert r["n_islands"] <= r["n_events"]


def test_l_diversity_partitions_customers(spark, sf_dir):
    rows = wave45.q_l_diversity(spark, sf_dir).collect()
    total = sum(r["n_customers"] for r in rows)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert total == cust.count()
    for r in rows:
        # a group needs at least l members to show l distinct values
        assert r["n_customers"] >= r["l"] * r["n_groups"]
