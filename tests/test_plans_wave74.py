"""Seventy-fourth-wave tests: oracle parity plus invariants (cap
accounting, R^2 in [0,1], LOO excludes self)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.plans import all_specs, wave74
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("s_frequency_cap", "a_dow_strength", "s_target_encoding_loo")


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


def test_frequency_cap_accounting(spark, sf_dir):
    rows = wave74.s_frequency_cap(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["n_kept"] + r["n_removed"] == r["n_docs"]
        # the soft cap keeps strictly more than keep-one would only
        # when groups of >= 2 exist; either way kept >= 1 per lang
        assert r["n_kept"] >= 1


def test_dow_r2_range(spark, sf_dir):
    r = wave74.a_dow_strength(spark, sf_dir).collect()[0]
    assert r["n_days"] == 30
    assert 0.0 <= r["dow_r2"] <= 1.0


def test_loo_excludes_self(spark, sf_dir):
    rows = wave74.s_target_encoding_loo(spark, sf_dir).collect()
    assert rows
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"), F.sum("c_acctbal").alias("s"))
        .collect()
    )
    stats = {r["c_nationkey"]: (r["n"], r["s"]) for r in cust}
    for r in rows:
        n, s = stats[r["c_nationkey"]]
        want = (s - r["own_bal"]) / (n - 1)
        assert r["loo_encoding"] == pytest.approx(want, rel=1e-4)
