"""Thirty-ninth-wave tests: oracle parity at sf0.001 plus tile-plan
geometry identities and cross-modal join coverage."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.plans import all_specs, wave39
from idn_area_etl_spark.sources.tables import TABLE_NAMES, load_table

ORACLE_NAMES = [s.name for s in wave39.SPECS if s.oracle is not None]


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


def test_all_wave39_registered():
    specs = all_specs()
    for spec in wave39.SPECS:
        assert spec.name in specs


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_wave39_matches_duckdb_oracle(spark, sf_dir, name):
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


def test_tile_plan_geometry(spark, sf_dir):
    rows = wave39.mm_image_tiles(spark, sf_dir).collect()
    T = wave39.TILE
    for r in rows:
        w, h, n = r["width"], r["height"], r["n_bytes"]
        # raster covers the payload
        assert w * h >= n > (w - 1) * h or w * h >= n  # W=ceil(sqrt(n))
        nx = -(-w // T)
        ny = -(-h // T)
        assert r["n_tiles"] == nx * ny
        # recompute checksum by explicit tile enumeration
        chk = 0
        for tx in range(nx):
            for ty in range(ny):
                chk += (
                    tx * T
                    + ty * T
                    + min(T, w - tx * T)
                    + min(T, h - ty * T)
                )
        assert r["geom_checksum"] == chk


def test_cross_modal_join_covers_all_pairs(spark, sf_dir):
    rows = wave39.mm_doc_embedding_join(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    n_pairs = docs.join(emb, docs.doc_id == emb.vec_id).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    for r in rows:
        assert r["mean_norm"] > 0
        assert r["chars_per_dim"] > 0
