"""Fifty-eighth-wave tests: oracle parity plus invariants (RDD jump
identity, interleave balance, assortativity range)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave58
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = (
    "a_regression_discontinuity",
    "s_curriculum_interleave",
    "g_degree_assortativity",
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


def test_rdd_jump_identity(spark, sf_dir):
    r = wave58.a_regression_discontinuity(spark, sf_dir).collect()[0]
    assert r["rdd_jump"] == pytest.approx(
        r["right_icpt"] - r["left_icpt"], abs=2e-6
    )
    for k in ("left_icpt", "right_icpt", "left_slope", "right_slope"):
        assert math.isfinite(r[k])


def test_curriculum_interleave_balanced(spark, sf_dir):
    rows = wave58.s_curriculum_interleave(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lang_counts = {
        r["lang"]: r["count"]
        for r in docs.groupBy("lang").count().collect()
    }
    for lang in ("de", "en", "es", "fr", "zh"):
        total = sum(r[lang] for r in rows)
        assert total == lang_counts[lang]
    # round-robin means minority languages appear in EVERY early
    # decile (they are exhausted last under rank-major order)
    min_lang = min(lang_counts, key=lang_counts.get)
    early = [r[min_lang] for r in rows[:5]]
    assert all(v > 0 for v in early)


def test_assortativity_range(spark, sf_dir):
    r = wave58.g_degree_assortativity(spark, sf_dir).collect()[0]
    assert r["n_edges"] > 0
    assert -1.0 <= r["assortativity"] <= 1.0
