"""Forty-third-wave tests: dataset-card oracle parity and internal
consistency (ALL row vs per-language sums)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave43
from idn_area_etl_spark.sources.tables import TABLE_NAMES


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
    assert "d_dataset_card" in all_specs()


def test_card_matches_duckdb_oracle(spark, sf_dir):
    spec = all_specs()["d_dataset_card"]
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


def test_card_all_row_consistent(spark, sf_dir):
    rows = {r["lang_group"]: r for r in wave43.d_dataset_card(spark, sf_dir).collect()}
    allr = rows.pop("ALL")
    assert allr["n_docs"] == sum(r["n_docs"] for r in rows.values())
    assert allr["total_tokens"] == sum(r["total_tokens"] for r in rows.values())
    assert allr["total_chars"] == sum(r["total_chars"] for r in rows.values())
    # global canonical groups can only merge across languages
    assert allr["n_unique"] <= sum(r["n_unique"] for r in rows.values())
    assert 0.0 <= allr["dup_rate"] < 1.0
