"""Thirty-seventh-wave tests: oracle parity at sf0.001 plus
invariants — interpolation correctness on a planted gap series,
waterfall effects sum to the revenue delta, percent-rank bounds."""

from __future__ import annotations

import math
from datetime import date

import duckdb
import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.plans import all_specs, wave37
from idn_area_etl_spark.sources.tables import TABLE_NAMES, load_table

ORACLE_NAMES = [s.name for s in wave37.SPECS if s.oracle is not None]


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


def test_all_wave37_registered():
    specs = all_specs()
    for spec in wave37.SPECS:
        assert spec.name in specs


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_wave37_matches_duckdb_oracle(spark, sf_dir, name):
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


def test_gapfill_interpolates_linearly(spark, sf_dir):
    rows = wave37.q_linear_gapfill(spark, sf_dir).collect()
    by_day = {r["day"]: r for r in rows}
    days = sorted(by_day)
    # continuous day axis
    assert all((b - a).days == 1 for a, b in zip(days, days[1:]))
    # observed days keep their exact value
    for r in rows:
        if r["observed"] is not None:
            assert r["filled"] == float(r["observed"])
    # a gap day's fill is the exact linear blend of its neighbors
    obs_days = [d for d in days if by_day[d]["observed"] is not None]
    for prev_d, next_d in zip(obs_days, obs_days[1:]):
        span = (next_d - prev_d).days
        if span <= 1:
            continue
        for mid in (d for d in days if prev_d < d < next_d):
            frac = (mid - prev_d).days / span
            expect = by_day[prev_d]["observed"] + frac * (
                by_day[next_d]["observed"] - by_day[prev_d]["observed"]
            )
            assert abs(by_day[mid]["filled"] - expect) < 1e-6


def test_waterfall_effects_sum_to_delta(spark, sf_dir):
    rows = wave37.q_price_volume_waterfall(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        delta = r["rev_p2"] - r["rev_p1"]
        assert abs((r["volume_effect"] + r["price_effect"]) - delta) < 0.01


def test_rank_normalize_top_is_one(spark, sf_dir):
    rows = wave37.q_rank_normalize(spark, sf_dir).collect()
    for r in rows:
        assert abs(r["top_scaled"] - 1.0) < 1e-9
