"""Seventy-ninth-wave tests: oracle parity plus invariants (noise
distribution sanity, SRM null behavior, pacing ends at 31/31)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave79
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("s_dp_noisy_counts", "a_srm_check", "q_revenue_pacing")


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


def test_noise_sanity(spark, sf_dir):
    rows = wave79.s_dp_noisy_counts(spark, sf_dir).collect()
    assert len(rows) == 25
    noises = [r["noise"] for r in rows]
    # Laplace(1) noise: both signs present, mean near 0, tails small
    assert any(n > 0 for n in noises) and any(n < 0 for n in noises)
    assert abs(sum(noises) / len(noises)) < 2.0
    for r in rows:
        assert r["released_n"] >= 0.0
        assert abs(r["released_n"] - r["true_n"]) <= abs(r["noise"]) + 1e-6


def test_srm_null_split_clean(spark, sf_dir):
    """The md5 split is a fair coin — SRM must NOT alarm on it."""
    r = wave79.a_srm_check(spark, sf_dir).collect()[0]
    assert r["n0"] + r["n1"] > 0
    assert not r["srm_alarm"]
    assert r["chi2"] >= 0


def test_pacing_terminal(spark, sf_dir):
    rows = wave79.q_revenue_pacing(spark, sf_dir).collect()
    assert rows[-1]["d"] == 30
    # cumulative revenue is complete by day 30; target line reaches
    # the full total only at day 31, so final pace = 31/30 ~ 1.033
    assert rows[-1]["pace_ratio"] == pytest.approx(31 / 30, rel=1e-6)
    cums = [r["cum_rev"] for r in rows]
    assert all(a < b for a, b in zip(cums, cums[1:]))
