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
