"""Sixty-sixth-wave tests: oracle parity plus numpy references for
the SSE split and invariants (AM-GM, over-dispersion direction)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from idn_area_etl_spark.plans import all_specs, wave66
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = ("a_best_split_sse", "a_negbin_moments", "a_atkinson_index")


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


def test_best_split_matches_numpy(spark, sf_dir):
    r = wave66.a_best_split_sse(spark, sf_dir).collect()[0]
    from pyspark.sql import functions as F

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("y"))
        .toPandas()
        .sort_values("day")
    )
    y = daily["y"].to_numpy()
    n = len(y)

    def sse(a):
        return ((a - a.mean()) ** 2).sum() if len(a) else 0.0

    best_k, best = None, np.inf
    for k in range(2, n - 1):
        s = sse(y[:k]) + sse(y[k:])
        if s < best - 1e-9:
            best_k, best = k, s
    assert r["split_after_day"] == best_k - 1
    assert r["sse_split"] == pytest.approx(best, rel=1e-6)
    assert 0.0 <= r["explained"] <= 1.0


def test_negbin_overdispersion_direction(spark, sf_dir):
    r = wave66.a_negbin_moments(spark, sf_dir).collect()[0]
    assert r["mean_events"] > 0
    assert r["var_events"] > 0
    # NB requires var > mean for a valid (r, p); if the stream is
    # under-dispersed p_hat > 1 and r_hat < 0 — flag either way
    if r["var_events"] > r["mean_events"]:
        assert 0 < r["p_hat"] < 1 and r["r_hat"] > 0
    else:
        assert r["p_hat"] >= 1


def test_atkinson_am_gm(spark, sf_dir):
    r = wave66.a_atkinson_index(spark, sf_dir).collect()[0]
    # AM >= GM on positive values => index in [0, 1)
    assert r["geomean_bal"] <= r["mean_bal"]
    assert 0.0 <= r["atkinson_eps1"] < 1.0
