"""Eighty-seventh-wave tests: oracle parity plus invariants (W+ in
range, spectrum partitions vocab, triangle ordering)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave87
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_wilcoxon_signed", "d_freq_spectrum", "g_top_triangles")


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


def test_wilcoxon_range(spark, sf_dir):
    r = wave87.a_wilcoxon_signed(spark, sf_dir).collect()[0]
    m = r["n_nonzero"]
    assert 0 <= r["w_plus"] <= m * (m + 1) / 2
    assert r["expected_w"] == pytest.approx(m * (m + 1) / 4, rel=1e-6)
    assert math.isfinite(r["z"])


def test_spectrum_partitions_vocab(spark, sf_dir):
    rows = wave87.d_freq_spectrum(spark, sf_dir).collect()
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = (
        docs.select(
            "lang",
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("w"),
        )
        .groupBy("lang")
        .agg(F.countDistinct("w").alias("v"))
        .collect()
    )
    want = {r["lang"]: r["v"] for r in vocab}
    got: dict[str, int] = {}
    for r in rows:
        got[r["lang"]] = got.get(r["lang"], 0) + r["n_types"]
        assert 1 <= r["freq_class"] <= 5
    assert got == want


def test_triangle_ordering(spark, sf_dir):
    rows = wave87.g_top_triangles(spark, sf_dir).collect()
    assert rows
    weights = [r["bottleneck"] for r in rows]
    assert all(a >= b for a, b in zip(weights, weights[1:]))
    for r in rows:
        assert r["x"] < r["y"] < r["z"]
        assert r["bottleneck"] >= 2
