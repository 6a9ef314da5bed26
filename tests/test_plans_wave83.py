"""Eighty-third-wave tests: oracle parity plus invariants (removal
accounting + contamination actually found, Borda bounds, Theil >= 0).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave83
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("s_decontaminate_split", "a_borda_ranking", "a_theil_index")


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


def test_decontamination_accounting(spark, sf_dir):
    rows = wave83.s_decontaminate_split(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_train_before"] == r["n_removed"] + r["n_train_after"]
        assert r["n_train_after"] > 0
    # planted near-dups guarantee at least some contamination overall
    assert sum(r["n_removed"] for r in rows) >= 1


def test_borda_structure(spark, sf_dir):
    rows = wave83.a_borda_ranking(spark, sf_dir).collect()
    assert [r["consensus_rank"] for r in rows] == list(range(1, 11))
    bordas = [r["borda"] for r in rows]
    assert all(a <= b for a, b in zip(bordas, bordas[1:]))
    for r in rows:
        assert 3 <= r["borda"] <= 75  # ranks in 1..25 each
        assert r["r_rev"] >= 1 and r["r_cust"] >= 1 and r["r_bal"] >= 1


def test_theil_nonnegative(spark, sf_dir):
    r = wave83.a_theil_index(spark, sf_dir).collect()[0]
    assert r["theil_t"] >= 0.0
    assert r["n_customers"] > 0
