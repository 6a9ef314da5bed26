"""Tenth wave: multimodal plumbing depth + the vectorized-UDF path.

- **Binary windowing** (`operators/multimodal.py:chunk_binary`): sliding
  byte windows over binary payloads (audio hops / shard splits) as a
  pure native expression — sequence-with-stride + binary substring,
  whole-stage codegen end to end.  The oracle uses VARCHAR substring:
  for ASCII payloads char offsets equal byte offsets, and DuckDB md5
  hashes the same bytes.
- **Frame sampling** (`operators/multimodal.py:frame_sample`): 1→N
  Arrow-batched expansion with a stubbed codec (no ffmpeg in this
  container) — rows-only driver check; determinism and shape pinned in
  pytest.
- **NFC normalization** (`operators/text.py:nfc_normalize_udf`): the
  deliberate pandas_udf showcase (no native Spark expression exists);
  oracle = DuckDB ``nfc_normalize`` (both sides implement UAX#15 —
  trivially equal on the ASCII corpus; planted non-NFC fixtures in
  pytest prove the real behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.multimodal import chunk_binary, frame_sample
from idn_area_etl_spark.operators.text import nfc_normalize_udf
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


def _blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )


def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-byte windows at stride 16 over the first 50 payloads."""
    blobs = _blobs(spark, sf_dir).filter(F.col("doc_id") < 50)
    return chunk_binary(blobs, chunk=32, stride=16).orderBy(
        "doc_id", "chunk_no"
    )


MM_AUDIO_WINDOWS_SQL = """
WITH offs AS (
  SELECT doc_id, text,
    unnest(generate_series(1, greatest(1, length(text) - 31), 16)) AS off
  FROM documents
  WHERE doc_id < 50
)
SELECT doc_id,
  CAST((off - 1) / 16 + 1 AS INT) AS chunk_no,
  CAST(off AS INT) AS offset,
  CAST(length(substring(text, off, 32)) AS INT) AS chunk_len,
  md5(substring(text, off, 32)) AS chunk_md5
FROM offs
ORDER BY doc_id, chunk_no
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stubbed codec (fake=True) → not SQL-expressible: rows-only check;
    # determinism and schema pinned in test_plans_wave10.py.
    blobs = _blobs(spark, sf_dir).filter(F.col("doc_id") < 50)
    return frame_sample(blobs, n_samples=4, fake=True).orderBy(
        "doc_id", "frame_no"
    )


def d_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nfc = nfc_normalize_udf()
    normed = nfc(F.col("text"))
    return docs.select(
        "doc_id",
        F.length(normed).alias("n_chars_nfc"),
        (normed != F.col("text")).alias("changed"),
    ).orderBy("doc_id")


D_UNICODE_NFC_SQL = """
SELECT doc_id,
  CAST(length(nfc_normalize(text)) AS INT) AS n_chars_nfc,
  nfc_normalize(text) <> text AS changed
FROM documents
ORDER BY doc_id
"""


SPECS = [
    QuerySpec("mm_audio_windows", mm_audio_windows, MM_AUDIO_WINDOWS_SQL,
              doc="native sliding byte windows over binary payloads",
              tags=("multimodal",)),
    QuerySpec("mm_frame_sample", mm_frame_sample, None,
              doc="Arrow-batched 1→N frame sampling (stub codec, rows-only)",
              tags=("multimodal",)),
    QuerySpec("d_unicode_nfc", d_unicode_nfc, D_UNICODE_NFC_SQL,
              doc="pandas_udf NFC normalization vs DuckDB nfc_normalize",
              tags=("text",)),
]
