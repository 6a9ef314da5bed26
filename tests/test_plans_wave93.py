"""Ninety-third-wave tests: oracle parity plus invariants (conversion
bounds + median gap in window, 2x2 totals + null non-rejection)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave93
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("q_second_order_conversion", "a_moods_median")


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


def test_second_order_structure(spark, sf_dir):
    rows = wave93.q_second_order_conversion(spark, sf_dir).collect()
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_new_buyers"] for r in rows) == n_cust
    for r in rows:
        assert 0 <= r["n_converted"] <= r["n_new_buyers"]
        assert 0.0 <= r["conversion_90d"] <= 1.0
        if r["median_gap_days"] is not None:
            assert 0 <= r["median_gap_days"] <= 90


def test_moods_median_null(spark, sf_dir):
    r = wave93.a_moods_median(spark, sf_dir).collect()[0]
    per_user = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    total = (
        r["ctl_below"] + r["ctl_above"] + r["trt_below"] + r["trt_above"]
    )
    assert total == per_user
    assert r["chi2_cc"] >= 0
    # the md5 split is null — medians should not differ
    assert not r["reject_equal_medians"]
