"""Fifty-fifth-wave tests: oracle parity plus invariants (buckets
ordered by mean nll, Chapman estimate near truth, support bounds)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave55
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("d_quality_buckets", "a_capture_recapture", "g_edge_support")


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


def test_quality_buckets_ordered(spark, sf_dir):
    rows = wave55.d_quality_buckets(spark, sf_dir).collect()
    by_lang: dict[str, dict[int, float]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r["mean_nll"]
        assert r["n_docs"] > 0
    for lang, d in by_lang.items():
        assert set(d) == {1, 2, 3}
        # ntile ordered by nll ascending: head < middle < tail
        assert d[1] <= d[2] <= d[3]


def test_capture_recapture_near_truth(spark, sf_dir):
    r = wave55.a_capture_recapture(spark, sf_dir).collect()[0]
    assert r["m"] <= min(r["n1"], r["n2"])
    assert r["n1"] < r["true_n"] and r["n2"] < r["true_n"]
    # Chapman is nearly unbiased; with p=0.4 samples the estimate
    # lands within a loose factor of the truth even at small n
    assert 0.5 * r["true_n"] <= r["chapman_est"] <= 2.0 * r["true_n"]


def test_edge_support_bounds(spark, sf_dir):
    rows = wave55.g_edge_support(spark, sf_dir).collect()
    assert rows
    total_edges = sum(r["n_edges"] for r in rows)
    assert total_edges > 0
    for r in rows:
        assert r["support"] >= 0
        assert r["n_edges"] > 0
