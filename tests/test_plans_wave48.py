"""Forty-eighth-wave tests: oracle parity plus invariants (gains
monotone, Wilson bounds bracket the rate, Heaps growth concave-ish).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave48
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = (
    "a_cumulative_gains",
    "q_hourly_conversion_wilson",
    "d_vocab_growth",
)


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


def test_gains_monotone_and_bounded(spark, sf_dir):
    rows = wave48.a_cumulative_gains(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    caps = [r["cum_capture"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(caps, caps[1:]))
    assert abs(caps[-1] - 1.0) < 1e-9
    assert abs(rows[-1]["cum_lift"] - 1.0) < 1e-9
    # the scorer is near-random on synthetic data, so lift is NOT
    # necessarily monotone — but it is always positive and bounded by
    # the best-possible capture ratio
    for r in rows:
        assert r["cum_lift"] > 0.0
        assert r["cum_capture"] <= 1.0 + 1e-9


def test_wilson_brackets_rate(spark, sf_dir):
    rows = wave48.q_hourly_conversion_wilson(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0
        assert r["k"] <= r["n"]


def test_vocab_growth_monotone(spark, sf_dir):
    rows = wave48.d_vocab_growth(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    toks = [r["cum_tokens"] for r in rows]
    voc = [r["vocab"] for r in rows]
    assert all(a < b for a, b in zip(toks, toks[1:]))
    assert all(a <= b for a, b in zip(voc, voc[1:]))
    betas = {r["heaps_beta"] for r in rows}
    assert len(betas) == 1
    # vocabulary grows sublinearly (or saturates) on shared-vocab text
    (beta,) = betas
    assert beta < 1.0
