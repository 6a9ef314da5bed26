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


def q_calendar_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order calendar: exercises the date-function breadth
    (date_trunc / quarter / dayofweek / last_day / datediff) in one
    map-side-combinable aggregation.  Weekend test uses Spark's
    1=Sunday convention (the oracle shifts DuckDB's 0=Sunday)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        orders.groupBy(
            F.date_trunc("month", d).alias("month_start"),
            F.quarter(d).alias("qtr"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.when(F.dayofweek(d).isin(1, 7), 1).otherwise(0)
            ).cast("long").alias("weekend_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("revenue"),
            F.datediff(F.max(d), F.min(d)).alias("days_span"),
        )
        .withColumn(
            "month_days", F.dayofmonth(F.last_day(F.col("month_start")))
        )
        .orderBy("month_start")
    )


Q_CALENDAR_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  CAST(quarter(o_orderdate) AS INT) AS qtr,
  COUNT(*) AS n_orders,
  CAST(SUM(CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 ELSE 0 END)
       AS BIGINT) AS weekend_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
  CAST(datediff('day', MIN(o_orderdate), MAX(o_orderdate)) AS INT)
    AS days_span,
  CAST(day(last_day(date_trunc('month', o_orderdate))) AS INT) AS month_days
FROM orders
GROUP BY date_trunc('month', o_orderdate), quarter(o_orderdate)
ORDER BY month_start
"""


SPECS = [
    QuerySpec("q_calendar_revenue", q_calendar_revenue, Q_CALENDAR_SQL,
              doc="calendar/date-function breadth aggregation",
              tags=("analytics",)),
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
