"""Fifty-seventh-wave tests: oracle parity plus invariants (indices
positive, migration matrix partitions customers, entropy bounded by
ln(k))."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave57
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_price_indices", "q_tier_migration", "a_markov_entropy_rate")


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


def test_price_indices_positive(spark, sf_dir):
    r = wave57.a_price_indices(spark, sf_dir).collect()[0]
    assert r["n_parts"] > 0
    assert r["laspeyres"] > 0
    assert r["paasche"] > 0


def test_migration_partitions_customers(spark, sf_dir):
    rows = wave57.q_tier_migration(spark, sf_dir).collect()
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 0 <= r["from_tier"] <= 4
        assert 0 <= r["to_tier"] <= 4
    # no (0, 0) cell: every counted customer ordered in some era
    assert not any(
        r["from_tier"] == 0 and r["to_tier"] == 0 for r in rows
    )


def test_entropy_rate_bounded(spark, sf_dir):
    r = wave57.a_markov_entropy_rate(spark, sf_dir).collect()[0]
    # 5 event types -> entropy rate can't beat ln(5)
    assert 0.0 < r["entropy_rate_nats"] <= math.log(5) + 1e-9
    assert r["n_transitions_kinds"] <= 25
