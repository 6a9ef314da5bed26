"""Sixty-ninth-wave tests: oracle parity plus invariants (null split
not extreme-proof, audit pairs symmetric-safe, folds balanced)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave69
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = (
    "a_permutation_test",
    "q_duplicate_payment_screen",
    "s_stratified_kfold",
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


def test_permutation_null_behaves(spark, sf_dir):
    """The observed split IS one of the null draws (md5 of the same
    stream), so permuted diffs should reach it often — a large
    n_as_extreme is expected, never 0-out-of-24 significance."""
    r = wave69.a_permutation_test(spark, sf_dir).collect()[0]
    assert r["n_perms"] == 24
    assert r["n_as_extreme"] >= 1
    assert math.isfinite(r["observed_diff"])


def test_duplicate_screen_nonempty_and_positive(spark, sf_dir):
    rows = wave69.q_duplicate_payment_screen(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_pairs"] >= 1
        assert r["exposed_amount"] > 0


def test_kfold_balance(spark, sf_dir):
    rows = wave69.s_stratified_kfold(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    label_counts = {
        r["label"]: r["count"]
        for r in emb.groupBy("label").count().collect()
    }
    per_label: dict[int, list[int]] = {}
    for r in rows:
        per_label.setdefault(r["label"], []).append(r["n"])
    for label, counts in per_label.items():
        assert sum(counts) == label_counts[label]
        # round-robin keeps folds within 1 of each other
        assert max(counts) - min(counts) <= 1
