"""Forty-ninth-wave tests: oracle parity plus invariants (pair
support dominated by unordered co-occurrence, sample size decreasing
in MDE, resample keeps en more often than other languages)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave49
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = (
    "q_seq_pattern_support",
    "a_sample_size_power",
    "s_importance_resample",
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


def test_seq_support_properties(spark, sf_dir):
    rows = wave49.q_seq_pattern_support(spark, sf_dir).collect()
    assert len(rows) == 20  # 5 types, ordered pairs
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    for r in rows:
        assert 0 < r["support_users"] <= n_users
        assert 0.0 < r["support_frac"] <= 1.0


def test_sample_size_decreasing_in_mde(spark, sf_dir):
    rows = wave49.a_sample_size_power(spark, sf_dir).collect()
    assert [r["rel_mde"] for r in rows] == [0.01, 0.02, 0.05, 0.10]
    sizes = [r["n_per_arm"] for r in rows]
    assert all(a > b for a, b in zip(sizes, sizes[1:]))
    for r in rows:
        assert r["target_rate"] > r["base_rate"]
        assert r["n_per_arm"] > 0


def test_resample_prefers_target_language(spark, sf_dir):
    rows = {r["lang"]: r for r in wave49.s_importance_resample(
        spark, sf_dir
    ).collect()}
    assert set(rows) == {"de", "en", "es", "fr", "zh"}
    en_share = rows["en"]["kept_share"]
    others = [r["kept_share"] for lang, r in rows.items() if lang != "en"]
    # the shared synthetic vocabulary keeps the LLR signal weak, so a
    # single language can beat en by noise — but on average the
    # target language must be preferred
    assert en_share > sum(others) / len(others)
    for r in rows.values():
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert r["kept_tokens"] >= 0
