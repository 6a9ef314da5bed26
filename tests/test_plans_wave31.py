"""Thirty-first-wave tests: oracle parity at sf0.001 plus invariants —
skew-report identities, weighted-median definition check, conversion
bounds.  (BPE has its own exact-reference suite in test_bpe.py.)"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.plans import all_specs, wave31
from idn_area_etl_spark.sources.tables import TABLE_NAMES, load_table

ORACLE_NAMES = [s.name for s in wave31.SPECS if s.oracle is not None]


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


def test_all_wave31_registered():
    specs = all_specs()
    for spec in wave31.SPECS:
        assert spec.name in specs


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_wave31_matches_duckdb_oracle(spark, sf_dir, name):
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


def test_skew_report_identities(spark, sf_dir):
    row = wave31.q_skew_report(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").count()
    assert row["n_keys"] == per_key.count()
    assert row["max_cnt"] == per_key.agg(F.max("count")).collect()[0][0]
    assert row["skew_ratio"] >= 1.0
    assert len(row["hot_keys"].split(",")) == wave31.SKEW_TOP_KEYS


def test_weighted_median_definition(spark, sf_dir):
    rows = wave31.q_weighted_median_price(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias(
            "price"
        ),
        "l_quantity",
    )
    pdf = li.toPandas()
    for r in rows:
        grp = pdf[pdf.l_returnflag == r["l_returnflag"]].sort_values("price")
        cum = grp.l_quantity.cumsum()
        half = grp.l_quantity.sum() / 2
        expected = grp.price[cum >= half].iloc[0]
        assert abs(r["weighted_median_price"] - expected) < 1e-9


def test_conversion_counts_bounded(spark, sf_dir):
    rows = wave31.q_conversion_latency(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["n_converted"] <= r["n_signups"]
        if r["n_converted"]:
            assert r["mean_latency_hours"] >= 0
