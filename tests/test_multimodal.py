"""Multimodal binary-column plumbing tests (decode is stubbed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.multimodal import (
    binary_metadata,
    decode_payloads,
)

PNG_MAGIC = bytes.fromhex("89504e470d0a1a0a")


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [
        (1, PNG_MAGIC + b"fakepngdata"),
        (2, b"plain text payload"),
        (3, b""),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_binary_metadata(blobs):
    rows = {r["doc_id"]: r for r in binary_metadata(blobs).collect()}
    assert rows[1]["n_bytes"] == len(PNG_MAGIC) + 11
    assert rows[1]["magic_hex"].startswith("89504E47")
    assert rows[2]["n_bytes"] == 18
    assert rows[3]["n_bytes"] == 0
    assert len(rows[2]["content_md5"]) == 32


def test_decode_stub_raises_without_fake(blobs):
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        decode_payloads(blobs, fake=False).collect()


def test_fake_decode_is_deterministic_and_typed(blobs):
    out = decode_payloads(blobs, fake=True)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_bytes", "media_type", "width", "height", "n_frames",
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["media_type"] == "image/png"
    assert rows[2]["media_type"] == "application/octet-stream"
    again = {r["doc_id"]: r for r in decode_payloads(blobs, fake=True).collect()}
    assert rows == again
