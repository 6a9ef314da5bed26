"""Pure-stdlib codecs for uncompressed media containers.

Real header+payload parsers (and matching encoders) for the two
uncompressed formats a container with no media libraries can still
handle honestly:

- **WAV** (RIFF little-endian, PCM): ``encode_wav`` writes the
  canonical 44-byte header + data chunk with ``struct``;
  ``parse_wav`` is an independent chunk walker — it verifies the
  RIFF/WAVE magic, then iterates ``<4s<I`` chunk headers, decoding
  ``fmt `` (audio format, channels, sample rate, block align, bits)
  and capturing ``data`` payload bytes, skipping unknown chunks by
  their declared size (word-aligned) exactly as a spec-conformant
  reader must.
- **BMP** (BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp, bottom-up):
  ``encode_bmp`` packs the 14+40-byte headers and pads each pixel
  row to a 4-byte boundary; ``parse_bmp`` re-reads both headers,
  validates magic/bpp/compression, and returns the de-padded pixel
  buffer in row order.

These are the decode stage the multimodal operators
(:mod:`idn_area_etl_spark.operators.multimodal`) run inside
``mapInPandas`` — compressed formats (PNG/JPEG/MP4) would slot in
the same way once their libraries exist in the environment.

Reference parity: the reference has no media path; this implements
the SURVEY.md multimodal extension with the honest subset of codecs
expressible in pure stdlib.
"""

from __future__ import annotations

import struct

WAV_HEADER_BYTES = 44  # RIFF(12) + fmt(8+16) + data header(8)
BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40)


def encode_wav(
    pcm: bytes,
    sample_rate: int,
    n_channels: int = 1,
    sampwidth: int = 2,
) -> bytes:
    """Canonical-form PCM WAV: RIFF header, ``fmt `` chunk, ``data``
    chunk.  ``len(pcm)`` must be a multiple of the frame size."""
    block_align = n_channels * sampwidth
    if len(pcm) % block_align:
        raise ValueError(
            f"pcm length {len(pcm)} not a multiple of frame size {block_align}"
        )
    byte_rate = sample_rate * block_align
    return b"".join(
        (
            struct.pack("<4sI4s", b"RIFF", 36 + len(pcm), b"WAVE"),
            struct.pack(
                "<4sIHHIIHH",
                b"fmt ",
                16,
                1,  # PCM
                n_channels,
                sample_rate,
                byte_rate,
                block_align,
                sampwidth * 8,
            ),
            struct.pack("<4sI", b"data", len(pcm)),
            pcm,
        )
    )


def parse_wav(payload: bytes) -> dict:
    """Chunk-walking RIFF/WAVE reader.  Returns ``{n_channels,
    sample_rate, bits_per_sample, block_align, n_frames, pcm}``.
    Raises ``ValueError`` on malformed payloads."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            (
                audio_format,
                n_channels,
                sample_rate,
                _byte_rate,
                block_align,
                bits,
            ) = struct.unpack_from("<HHIIHH", body, 0)
            if audio_format != 1:
                raise ValueError(f"unsupported audio format {audio_format}")
            fmt = (n_channels, sample_rate, block_align, bits)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    n_channels, sample_rate, block_align, bits = fmt
    if block_align == 0 or len(pcm) % block_align:
        raise ValueError("data chunk not frame-aligned")
    return {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "block_align": block_align,
        "n_frames": len(pcm) // block_align,
        "pcm": pcm,
    }


def _bmp_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # 24bpp rows pad to 4-byte boundary


def encode_bmp(width: int, height: int, pixels_bgr: bytes) -> bytes:
    """24 bpp bottom-up BMP.  ``pixels_bgr`` is ``height`` rows of
    ``width*3`` bytes, top row first (rows are flipped on write, as
    the format stores bottom-up)."""
    if len(pixels_bgr) != width * height * 3:
        raise ValueError(
            f"pixel buffer {len(pixels_bgr)} != {width}x{height}x3"
        )
    stride = _bmp_stride(width)
    pad = b"\x00" * (stride - width * 3)
    rows = [
        pixels_bgr[r * width * 3 : (r + 1) * width * 3] + pad
        for r in range(height - 1, -1, -1)
    ]
    image = b"".join(rows)
    file_size = BMP_HEADER_BYTES + len(image)
    header = struct.pack(
        "<2sIHHI", b"BM", file_size, 0, 0, BMP_HEADER_BYTES
    ) + struct.pack(
        "<IiiHHIIiiII",
        40,  # BITMAPINFOHEADER size
        width,
        height,  # positive => bottom-up
        1,
        24,
        0,  # BI_RGB, uncompressed
        len(image),
        2835,
        2835,  # 72 DPI
        0,
        0,
    )
    return header + image


def parse_bmp(payload: bytes) -> dict:
    """BITMAPFILEHEADER + BITMAPINFOHEADER reader for uncompressed
    24 bpp payloads.  Returns ``{width, height, bits_per_pixel,
    pixels}`` with the de-padded pixel buffer in top-first row order.
    Raises ``ValueError`` on malformed payloads."""
    if len(payload) < BMP_HEADER_BYTES or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, file_size, _, _, data_offset = struct.unpack_from("<2sIHHI", payload, 0)
    (
        hdr_size,
        width,
        height,
        planes,
        bpp,
        compression,
        _img_size,
        _,
        _,
        _,
        _,
    ) = struct.unpack_from("<IiiHHIIiiII", payload, 14)
    if hdr_size < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bpp} bpp compression {compression}")
    bottom_up = height > 0
    height = abs(height)
    stride = _bmp_stride(width)
    need = data_offset + stride * height
    if need > len(payload):
        raise ValueError("truncated BMP pixel data")
    rows = [
        payload[data_offset + r * stride : data_offset + r * stride + width * 3]
        for r in range(height)
    ]
    if bottom_up:
        rows.reverse()
    return {
        "width": width,
        "height": height,
        "bits_per_pixel": bpp,
        "pixels": b"".join(rows),
    }


def sniff_media_type(payload: bytes) -> str:
    """Magic-byte media-type sniff for the formats the decode stage
    understands (plus the common compressed signatures, reported but
    not decodable without their libraries)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    if payload[:2] == b"BM":
        return "image/bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if payload[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    return "application/octet-stream"
