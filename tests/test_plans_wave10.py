"""Tenth-wave tests: oracle parity at sf0.001, multimodal plumbing
shape/determinism (the codec itself is stubbed), and real non-ASCII
NFC behavior the ASCII corpus can't exercise."""

from __future__ import annotations

import hashlib
import math
import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.multimodal import (
    FRAME_SCHEMA,
    chunk_binary,
    frame_sample,
)
from idn_area_etl_spark.operators.text import nfc_normalize_udf
from idn_area_etl_spark.plans import all_specs, wave10
from idn_area_etl_spark.sources.tables import TABLE_NAMES

ORACLE_NAMES = [s.name for s in wave10.SPECS if s.oracle is not None]


def _norm(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "<null>" if math.isnan(v) else repr(v)
    if isinstance(v, bool):
        return str(int(v))
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


def test_all_wave10_registered():
    specs = all_specs()
    for spec in wave10.SPECS:
        assert spec.name in specs


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_wave10_matches_duckdb_oracle(spark, sf_dir, oracle, name):
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


# --------------------------------------------------------------------------
# chunk_binary: exact windows against hashlib on a tiny fixture
# --------------------------------------------------------------------------


def test_chunk_binary_exact_windows(spark):
    payload = b"0123456789abcdefghijklmnopqrstuvwxyzABCD"  # 40 bytes
    blobs = spark.createDataFrame([(1, payload)], ["doc_id", "payload"])
    rows = sorted(
        chunk_binary(blobs, chunk=16, stride=8).collect(),
        key=lambda r: r.chunk_no,
    )
    # offsets 1, 9, 17, 25 (sequence stops at len-chunk+1 = 25)
    assert [r.offset for r in rows] == [1, 9, 17, 25]
    assert all(r.chunk_len == 16 for r in rows)
    for r in rows:
        expect = hashlib.md5(payload[r.offset - 1 : r.offset + 15]).hexdigest()
        assert r.chunk_md5 == expect


def test_chunk_binary_short_payload_single_window(spark):
    blobs = spark.createDataFrame([(1, b"tiny")], ["doc_id", "payload"])
    rows = chunk_binary(blobs, chunk=16, stride=8).collect()
    assert len(rows) == 1
    assert rows[0].chunk_len == 4


# --------------------------------------------------------------------------
# frame_sample: stub determinism, fan-out shape, hard NotImplementedError
# --------------------------------------------------------------------------


def test_frame_sample_deterministic_and_shaped(spark):
    blobs = spark.createDataFrame(
        [(1, b"x" * 100), (2, b"y" * 300)], ["doc_id", "payload"]
    )
    a = sorted(map(tuple, frame_sample(blobs, n_samples=4, fake=True).collect()))
    b = sorted(map(tuple, frame_sample(blobs, n_samples=4, fake=True).collect()))
    assert a == b
    assert frame_sample(blobs, n_samples=4, fake=True).schema == FRAME_SCHEMA
    per_doc = {}
    for row in a:
        per_doc.setdefault(row[0], []).append(row)
    for doc_id, frames in per_doc.items():
        assert 1 <= len(frames) <= 4
        assert all(ts == fn * 40 for _, fn, ts, _ in frames)


def test_frame_sample_real_codec_raises(spark):
    blobs = spark.createDataFrame([(1, b"abc")], ["doc_id", "payload"])
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        frame_sample(blobs, fake=False).collect()


# --------------------------------------------------------------------------
# NFC: real non-ASCII behavior, cross-checked against DuckDB
# --------------------------------------------------------------------------


def test_nfc_normalizes_decomposed_text(spark):
    decomposed = "café and Å"  # e+combining acute, A+ring
    composed = unicodedata.normalize("NFC", decomposed)
    assert decomposed != composed  # fixture is genuinely non-NFC
    df = spark.createDataFrame([(1, decomposed), (2, "plain")], ["doc_id", "text"])
    nfc = nfc_normalize_udf()
    out = {
        r.doc_id: r.n
        for r in df.select("doc_id", nfc(F.col("text")).alias("n")).collect()
    }
    assert out[1] == composed
    assert out[2] == "plain"
    con = duckdb.connect()
    duck = con.sql("SELECT nfc_normalize(?)", params=[decomposed]).fetchone()[0]
    con.close()
    assert out[1] == duck
