"""Twentieth-wave tests: oracle parity at sf0.001, planted-violation
detection for the quality report, and statistical identities."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.plans import all_specs, wave20
from idn_area_etl_spark.sources.tables import TABLE_NAMES, load_table

ORACLE_NAMES = [s.name for s in wave20.SPECS if s.oracle is not None]


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


def test_all_wave20_registered():
    specs = all_specs()
    for spec in wave20.SPECS:
        assert spec.name in specs


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_wave20_matches_duckdb_oracle(spark, sf_dir, name):
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


def test_quality_report_clean_data_all_pass(spark, sf_dir):
    rows = wave20.q_data_quality_report(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.n_violations == 0 and r.passed == 1, r.check_name


def test_quality_checks_catch_planted_violations(spark):
    """The same check expressions must flag a deliberately corrupt
    frame (duplicate PK, bad status, non-positive price)."""
    bad = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (1, "O", 20.0),   # duplicate orderkey
            (2, "X", 30.0),   # bad status
            (3, "F", -5.0),   # non-positive price
        ],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    row = bad.agg(
        (F.count("*") - F.count_distinct("o_orderkey")).alias("dup"),
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")).alias(
            "status"
        ),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("price"),
    ).collect()[0]
    assert (row.dup, row.status, row.price) == (1, 1, 1)


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = wave20.q_benford_totalprice(spark, sf_dir).collect()
    digits = [r.digit for r in rows]
    assert set(digits) <= set(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.chi2_contrib >= 0.0


def test_dormancy_bounds(spark, sf_dir):
    rows = wave20.q_dormancy_reactivation(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_reactivations <= r.n_gaps
        assert r.max_gap_hours > 0.0


def test_ab_ttest_cohorts_partition_events(spark, sf_dir):
    rows = wave20.q_ab_ttest(spark, sf_dir).collect()
    totals = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        assert r.n_a + r.n_b == totals[r.event_type]
        assert math.isfinite(r.t_stat)
