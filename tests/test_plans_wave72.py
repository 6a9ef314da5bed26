"""Seventy-second-wave tests: oracle parity plus shrinkage-toward-
the-mean, attach bounds, and lognormal consistency."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave72
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("q_attach_rate_lift", "a_eb_shrinkage", "d_lognormal_fit")


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


def test_attach_bounds(spark, sf_dir):
    rows = wave72.q_attach_rate_lift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["attach_rate"] < 1.0
        assert r["order_value_lift"] > 0
        assert r["n_with"] >= 1


def test_shrinkage_toward_grand_mean(spark, sf_dir):
    rows = wave72.a_eb_shrinkage(spark, sf_dir).collect()
    assert len(rows) == 25
    grand = sum(r["raw_rate"] for r in rows) / len(rows)
    for r in rows:
        lo = min(r["raw_rate"], grand) - 1e-9
        hi = max(r["raw_rate"], grand) + 1e-9
        # shrunk rate lies between the raw rate and the prior mean
        assert lo <= r["shrunk_rate"] <= hi
        assert 0.0 <= r["shrunk_rate"] <= 1.0


def test_lognormal_consistency(spark, sf_dir):
    rows = wave72.d_lognormal_fit(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["sigma"] > 0
        assert r["median_len"] == pytest.approx(
            math.exp(r["mu"]), rel=1e-4
        )
