"""Twenty-seventh-wave tests: oracle parity at sf0.001 plus
invariants — RFM partition-of-customers, LTV monotonicity, gap
identities, equi-depth balance, Zipf slope sanity."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.plans import all_specs, wave27
from idn_area_etl_spark.sources.tables import TABLE_NAMES, load_table

ORACLE_NAMES = [s.name for s in wave27.SPECS if s.oracle is not None]


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


def test_all_wave27_registered():
    specs = all_specs()
    for spec in wave27.SPECS:
        assert spec.name in specs


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_wave27_matches_duckdb_oracle(spark, sf_dir, name):
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


def test_rfm_partitions_all_customers(spark, sf_dir):
    rows = wave27.q_rfm_segments(spark, sf_dir).collect()
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        parts = r["segment"].split("-")
        assert len(parts) == 3
        assert all(1 <= int(p) <= 5 for p in parts)


def test_cohort_ltv_cumulative_monotone(spark, sf_dir):
    rows = wave27.q_cohort_ltv(spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(
            (r["age_months"], r["cum_ltv"])
        )
    for pts in by_cohort.values():
        ages = [a for a, _ in pts]
        assert ages == sorted(ages)
        ltvs = [v for _, v in pts]
        assert all(b >= a for a, b in zip(ltvs, ltvs[1:]))
    # First age of every cohort is 0 (the cohort-defining order).
    assert all(min(a for a, _ in pts) == 0 for pts in by_cohort.values())


def test_gap_counts_identity(spark, sf_dir):
    rows = wave27.q_interpurchase_gaps(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").count().collect()
    expected = sum(r["count"] - 1 for r in per_cust)
    assert sum(r["n_gaps"] for r in rows) == expected


def test_equidepth_buckets_balanced_and_ordered(spark, sf_dir):
    rows = wave27.q_equidepth_histogram(spark, sf_dir).collect()
    n_total = sum(r["n"] for r in rows)
    ideal = n_total / wave27.EQUIDEPTH_BUCKETS
    for r in rows:
        # Equal-frequency up to threshold ties.
        assert abs(r["n"] - ideal) < 0.25 * ideal + 2
        assert r["lo"] <= r["hi"]
    lows = [r["lo"] for r in sorted(rows, key=lambda r: r["bucket"])]
    assert lows == sorted(lows)


def test_zipf_slope_negative(spark, sf_dir):
    row = wave27.d_zipf_slope(spark, sf_dir).collect()[0]
    assert row["n_terms"] > 10
    assert row["zipf_slope"] < 0
