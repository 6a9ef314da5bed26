"""Eightieth-wave tests: oracle parity plus invariants (DW in (0,4),
F1 between precision/recall bounds, confusion totals reconcile)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave80
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_durbin_watson", "a_macro_f1", "d_langid_confusion")


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


def test_dw_range(spark, sf_dir):
    r = wave80.a_durbin_watson(spark, sf_dir).collect()[0]
    assert 0.0 < r["durbin_watson"] < 4.0


def test_f1_bounds(spark, sf_dir):
    rows = wave80.a_macro_f1(spark, sf_dir).collect()
    assert rows
    for r in rows:
        p, rc, f1 = r["precision"], r["recall"], r["f1"]
        assert 0.0 <= p <= 1.0 and 0.0 <= rc <= 1.0
        # harmonic mean lies between min and max of (p, r)
        assert min(p, rc) - 1e-6 <= f1 <= max(p, rc) + 1e-6
        assert r["support"] > 0


def test_confusion_reconciles(spark, sf_dir):
    rows = wave80.d_langid_confusion(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r["n"] for r in rows) == docs.count()
    langs = {"de", "en", "es", "fr", "zh"}
    for r in rows:
        assert r["truth"] in langs
        assert r["lang_guess"] in langs
