"""Seventy-seventh-wave tests: oracle parity plus invariants (ego
density in [0,1], kappa below po, positional totals reconcile)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave77
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("g_ego_density", "a_cohens_kappa", "d_positional_profile")


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


def test_ego_density_range(spark, sf_dir):
    rows = wave77.g_ego_density(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ego_density"] <= 1.0
        assert r["edges_among"] <= r["k_neighbors"] * (
            r["k_neighbors"] - 1
        ) // 2


def test_kappa_structure(spark, sf_dir):
    r = wave77.a_cohens_kappa(spark, sf_dir).collect()[0]
    assert 0.0 <= r["po"] <= 1.0
    assert 0.0 < r["pe"] < 1.0
    # kappa <= po always; and kappa < 1 unless perfect agreement
    assert r["kappa"] <= r["po"] + 1e-9
    assert -1.0 <= r["kappa"] <= 1.0


def test_positional_totals(spark, sf_dir):
    rows = wave77.d_positional_profile(spark, sf_dir).collect()
    assert [r["bucket"] for r in rows] == [0, 1, 2, 3, 4]
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.select(
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert sum(r["n_tokens"] for r in rows) == total
    for r in rows:
        assert r["mean_token_len"] > 0
        assert 0.0 < r["distinct_share"] <= 1.0
