"""Sixty-second-wave tests: oracle parity plus invariants (HT close
to truth, progressive fees bounded by flat top-rate fees, triplet
counts)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.plans import all_specs, wave62
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_horvitz_thompson", "q_progressive_fees", "e_triplet_violations")


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


def test_ht_estimate_near_truth(spark, sf_dir):
    """HT is unbiased; with PPS weights on this skew the single
    deterministic draw should land within 25% of truth."""
    r = wave62.a_horvitz_thompson(spark, sf_dir).collect()[0]
    assert r["n_sampled"] > 0
    assert abs(r["ht_estimate"] - r["true_total"]) / r["true_total"] < 0.25


def test_progressive_fee_bounds(spark, sf_dir):
    rows = wave62.q_progressive_fees(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    totals = {
        r["o_orderpriority"]: r["t"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.sum("o_totalprice").alias("t"))
        .collect()
    }
    for r in rows:
        t = totals[r["o_orderpriority"]]
        # fees bracket between the lowest flat rate (100 bps) and the
        # top flat rate (400 bps) applied to the full amount
        assert 0.01 * t - 1 <= r["total_fees"] <= 0.04 * t + 1
        assert r["n_orders"] > 0


def test_triplet_counts(spark, sf_dir):
    r = wave62.e_triplet_violations(spark, sf_dir).collect()[0]
    assert r["n_triplets"] == 30
    assert 0 <= r["n_violations"] <= 30
    assert r["violation_rate"] == pytest.approx(
        r["n_violations"] / 30, abs=1e-6
    )
