"""Oracle parity for the third-wave TPC-H-shaped queries at sf0.001.

Mirrors the driver's correctness contract (row count + column names +
order-insensitive value comparison vs DuckDB) for the queries added in
plans/tpch3.py, so regressions surface in pytest before the per-round
gate runs.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb
import pytest

from idn_area_etl_spark.plans import all_specs
from idn_area_etl_spark.plans import tpch3
from idn_area_etl_spark.sources.tables import TABLE_NAMES

TPCH3_NAMES = [spec.name for spec in tpch3.SPECS]


def _norm(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "<null>" if math.isnan(v) else repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.isoformat()
    return str(v)


def _canonical(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return (
        [cols[i] for i in order],
        sorted(tuple(_norm(r[i]) for i in order) for r in rows),
    )


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_registry_has_no_duplicates_and_all_tpch3_registered():
    specs = all_specs()
    for name in TPCH3_NAMES:
        assert name in specs
        assert specs[name].oracle is not None


@pytest.mark.parametrize("name", TPCH3_NAMES)
def test_tpch3_matches_duckdb_oracle(spark, sf_dir, oracle, name):
    spec = all_specs()[name]
    sdf = spec.builder(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    rel = oracle.sql(spec.oracle)
    orows = rel.fetchall()
    s_cols, s_can = _canonical(srows, sdf.columns)
    o_cols, o_can = _canonical(orows, rel.columns)
    assert s_cols == o_cols
    assert len(s_can) == len(o_can)
    assert s_can == o_can
