"""Multimodal binary-column tests: native metadata plus the REAL
stdlib WAV/BMP decode stage (struct-based parsers run per Arrow
batch inside mapInPandas)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.functions.codecs import (
    encode_bmp,
    encode_wav,
    parse_bmp,
    parse_wav,
    sniff_media_type,
)
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
        (4, encode_wav(bytes(range(200)), 16000)),
        (5, encode_bmp(16, 4, bytes(range(192)))),
        (6, b"BM" + b"\x00" * 10),  # truncated BMP
        (7, None),  # NULL payload: reported, never a crash
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_binary_metadata(blobs):
    rows = {r["doc_id"]: r for r in binary_metadata(blobs).collect()}
    assert rows[1]["n_bytes"] == len(PNG_MAGIC) + 11
    assert rows[1]["magic_hex"].startswith("89504E47")
    assert rows[2]["n_bytes"] == 18
    assert rows[3]["n_bytes"] == 0
    assert len(rows[2]["content_md5"]) == 32


def test_decode_real_wav_and_bmp(blobs):
    rows = {r["doc_id"]: r for r in decode_payloads(blobs).collect()}
    wav = rows[4]
    assert wav["media_type"] == "audio/wav"
    assert wav["sample_rate"] == 16000
    assert wav["n_channels"] == 1
    assert wav["bits_per_sample"] == 16
    assert wav["n_frames"] == 100  # 200 bytes / 2-byte frames
    assert wav["decode_error"] is None
    bmp = rows[5]
    assert bmp["media_type"] == "image/bmp"
    assert (bmp["width"], bmp["height"]) == (16, 4)
    assert bmp["bits_per_sample"] == 24
    assert bmp["n_frames"] == 1
    assert bmp["decode_error"] is None


def test_decode_reports_codec_gaps_and_corruption(blobs):
    rows = {r["doc_id"]: r for r in decode_payloads(blobs).collect()}
    assert rows[1]["media_type"] == "image/png"
    assert "no codec" in rows[1]["decode_error"]
    assert rows[2]["media_type"] == "application/octet-stream"
    assert rows[3]["n_bytes"] == 0
    assert rows[6]["media_type"] == "image/bmp"
    assert rows[6]["decode_error"] is not None  # truncated, not a crash
    assert rows[7]["n_bytes"] is None
    assert rows[7]["decode_error"] == "null payload"
    assert all(r["width"] is None for k, r in rows.items() if k != 5)


# ------------------------------------------------------------------ #
# codec round-trips and spec-conformance corners (pure Python)
# ------------------------------------------------------------------ #


def test_wav_roundtrip_and_chunk_skipping():
    pcm = bytes(range(256)) * 4
    payload = encode_wav(pcm, 44100, n_channels=2, sampwidth=2)
    meta = parse_wav(payload)
    assert meta["pcm"] == pcm
    assert meta["sample_rate"] == 44100
    assert meta["n_channels"] == 2
    assert meta["n_frames"] == len(pcm) // 4
    # readers must skip unknown chunks by declared (word-aligned) size
    extra = (
        payload[:36]
        + struct.pack("<4sI", b"LIST", 5)
        + b"12345\x00"
        + payload[36:]
    )
    extra = extra[:4] + struct.pack("<I", len(extra) - 8) + extra[8:]
    assert parse_wav(extra)["pcm"] == pcm


def test_wav_rejects_malformed():
    with pytest.raises(ValueError):
        encode_wav(b"abc", 8000)  # not frame-aligned
    with pytest.raises(ValueError):
        parse_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        parse_wav(encode_wav(b"ab", 8000)[:-1])  # truncated data


def test_bmp_roundtrip_with_row_padding():
    # width 5 → 15-byte rows pad to 16: stride handling must round-trip
    px = bytes((i * 7) % 256 for i in range(5 * 3 * 3))
    payload = encode_bmp(5, 3, px)
    meta = parse_bmp(payload)
    assert meta["pixels"] == px
    assert (meta["width"], meta["height"]) == (5, 3)
    with pytest.raises(ValueError):
        encode_bmp(4, 4, px)  # wrong buffer size
    with pytest.raises(ValueError):
        parse_bmp(payload[:40])


def test_sniff_media_type():
    assert sniff_media_type(encode_wav(b"ab", 8000)) == "audio/wav"
    assert sniff_media_type(encode_bmp(1, 1, b"abc")) == "image/bmp"
    assert sniff_media_type(PNG_MAGIC + b"x") == "image/png"
    assert sniff_media_type(b"\xff\xd8\xff\xe0") == "image/jpeg"
    assert sniff_media_type(b"hello") == "application/octet-stream"
    assert sniff_media_type(b"") == "application/octet-stream"
