"""Fiftieth-wave tests: oracle parity plus invariants (polygon area
share plausible, cents conserved exactly, coverage bounded)."""

from __future__ import annotations

import math

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs, wave50
from idn_area_etl_spark.sources.tables import TABLE_NAMES

WAVE = (
    "j_points_in_polygon",
    "q_revenue_recognition",
    "d_stopword_coverage",
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


def test_polygon_share_plausible(spark, sf_dir):
    """Polygon area / (170 x 360) world box is ~5.6%; uniform points
    should land inside at a vaguely matching rate pooled over all
    nations."""
    rows = wave50.j_points_in_polygon(spark, sf_dir).collect()
    n = sum(r["n_customers"] for r in rows)
    k = sum(r["n_inside"] for r in rows)
    assert 0 < k < n
    share = k / n
    # shoelace area of the fixed polygon = 3250 deg^2; box = 61200
    assert 0.01 < share < 0.15


def test_revenue_recognition_conserves_cents(spark, sf_dir):
    rows = wave50.q_revenue_recognition(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    from pyspark.sql import functions as F

    total_cents = (
        orders.select(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "decimal(27,0)"
                )
            ).alias("c")
        ).collect()[0]["c"]
    )
    recognized_cents = round(sum(r["recognized"] for r in rows) * 100)
    assert int(recognized_cents) == int(total_cents)


def test_stopword_coverage_bounds(spark, sf_dir):
    rows = wave50.d_stopword_coverage(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r["stopwords"].split(",")) == 5
        assert 0.0 < r["coverage"] < 1.0
        assert r["stop_occ"] < r["total_occ"]
        # 5 of ~31 vocabulary words must absorb >5/31 of occurrences
        assert r["coverage"] > 5 / 31
