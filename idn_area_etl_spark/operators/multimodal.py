"""Multimodal column support: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed
metadata structs.  The Spark-side plumbing — schemas, Arrow-batched
``mapInPandas`` decode stage, partition sizing — is real and tested;
the actual codec is stubbed (this container ships no image/audio
libraries): :func:`decode_payloads` raises ``NotImplementedError``
unless ``fake=True``, which substitutes a deterministic fake decoder
so the pipeline shape is exercisable end-to-end.

Scale notes: decode is the textbook Pandas-UDF case — per-row Python
cost dominates, so Arrow batching (``spark.sql.execution.arrow...``)
and partition sizing (``maxRecordsPerFile`` / ``repartition`` before
decode) are what matter; metadata extraction stays native.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the decoded-media metadata struct
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def binary_metadata(blobs: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Native (no-decode) metadata over a binary column: byte length,
    content digest, magic-byte prefix.  Pure column expressions."""
    payload = F.col(payload_col)
    return blobs.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
        F.upper(F.hex(F.substring(payload, 1, 8))).alias("magic_hex"),
    )


def _fake_decode(pdf: pd.DataFrame, payload_col: str) -> pd.DataFrame:
    """Deterministic FAKE decode: derives plausible metadata purely
    from payload bytes (stand-in for PIL/ffmpeg, which are not in the
    container).  Clearly fake — do not ship decisions based on it."""
    payloads = pdf[payload_col]
    n_bytes = payloads.map(len)
    head = payloads.map(lambda b: b[:4].hex() if len(b) >= 4 else "")
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes.astype("int64"),
            "media_type": head.map(
                lambda h: "image/png" if h.startswith("89") else "application/octet-stream"
            ),
            "width": (n_bytes % 1920).astype("int32"),
            "height": (n_bytes % 1080).astype("int32"),
            "n_frames": pd.Series([1] * len(pdf), index=pdf.index, dtype="int32"),
        }
    )


def decode_payloads(
    blobs: DataFrame,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Arrow-batched decode stage over a binary column via mapInPandas.

    With real codecs this is where PIL/ffmpeg would run per batch;
    here the codec is STUBBED: ``fake=False`` raises
    ``NotImplementedError`` (no image/audio libs in this container),
    ``fake=True`` runs the deterministic fake decoder so schema,
    batching, and partitioning are exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present "
                    "in this environment; pass fake=True for the "
                    "deterministic stub decoder"
                )
            yield _fake_decode(pdf, payload_col)

    return blobs.select("doc_id", payload_col).mapInPandas(
        run, schema=MEDIA_META_SCHEMA
    )


#: schema of the sampled-frame rows (1 payload → N frames)
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def chunk_binary(
    blobs: DataFrame,
    chunk: int = 32,
    stride: int = 16,
    payload_col: str = "payload",
) -> DataFrame:
    """Sliding byte windows over a binary column — the audio-windowing
    / shard-split primitive (e.g. 25 ms hops over PCM).

    Entirely native: offsets come from ``sequence`` with a stride and
    ``substring`` operates on the binary payload JVM-side, so the
    expansion never leaves whole-stage codegen — no Python, no UDF.
    Row count multiplies by ~len/stride; at scale, repartition after
    if downstream is per-chunk heavy.
    """
    payload = F.col(payload_col)
    offsets = F.sequence(
        F.lit(1),
        F.greatest(F.lit(1), F.octet_length(payload) - F.lit(chunk - 1)),
        F.lit(stride),
    )
    win = F.expr(f"substring({payload_col}, off, {chunk})")
    return (
        blobs.select("doc_id", payload_col, F.explode(offsets).alias("off"))
        .select(
            "doc_id",
            (((F.col("off") - 1) / stride) + 1).cast("int").alias("chunk_no"),
            F.col("off").cast("int").alias("offset"),
            F.octet_length(win).alias("chunk_len"),
            F.md5(win).alias("chunk_md5"),
        )
    )


def frame_sample(
    blobs: DataFrame,
    n_samples: int = 4,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Evenly-spaced frame sampling from video-ish payloads: one input
    row fans out to ``n_samples`` frame rows (doc_id, frame_no, ts_ms,
    frame digest) — the table-function shape of a real ffmpeg sampler.

    The codec is STUBBED like :func:`decode_payloads`: ``fake=False``
    raises ``NotImplementedError``; ``fake=True`` derives a
    deterministic frame count (1 + n_bytes % 240 at a notional 25 fps)
    and per-frame digests from the payload bytes, so the Arrow
    batching, 1→N expansion, and output schema are exercised for real.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires video codecs not present in "
                    "this environment; pass fake=True for the "
                    "deterministic stub sampler"
                )
            out = {"doc_id": [], "frame_no": [], "ts_ms": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                n_frames = 1 + len(payload) % 240
                step = max(1, n_frames // n_samples)
                for frame_no in range(0, n_frames, step)[:n_samples]:
                    digest = hashlib.md5(
                        payload + frame_no.to_bytes(4, "big")
                    ).hexdigest()
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(frame_no)
                    out["ts_ms"].append(frame_no * 40)
                    out["frame_md5"].append(digest)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_no": pd.Series(out["frame_no"], dtype="int32"),
                    "ts_ms": pd.Series(out["ts_ms"], dtype="int64"),
                    "frame_md5": pd.Series(out["frame_md5"], dtype="object"),
                }
            )

    return blobs.select("doc_id", payload_col).mapInPandas(
        run, schema=FRAME_SCHEMA
    )
