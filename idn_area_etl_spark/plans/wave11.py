"""Eleventh wave: dataset-preparation ops for training pipelines.

- **Character entropy** — Shannon entropy per document (gibberish /
  compression-quality signal).  The -Σ p·log2(p) fold runs over
  char-sorted counts on both engines, so the float reduction has a
  fixed order and stays bit-identical.
- **Split assignment** — deterministic train/val/test hashing (salted
  md5 → percent bucket): reproducible on any cluster layout, no RNG,
  exact per-split counts oracle-checked.  The standard "assign once,
  never reshuffle" dataset split.
- **Batch packing** — running-token-sum packing into budgeted batches
  via a cumulative window (the streaming-friendly approximation of
  bin packing used for sequence-length bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import global_running_sum
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table

#: 2^52 (13 hex chars of md5) — same uniform-from-hash trick as wave 7.
_TWO_52 = float(1 << 52)


def d_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon entropy over characters.

    Scale: one explode + (doc, char) count (map-side combinable),
    then a row-local fold over the ≤ |alphabet| counts — the entropy
    arithmetic never crosses rows, and the fold order (sorted by
    char) is pinned so Spark and the oracle sum identically.
    """
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.explode(F.split(F.col("text"), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "n_chars", "ch").agg(
        F.count("*").alias("cnt")
    )
    per_doc = counts.groupBy("doc_id", "n_chars").agg(
        F.array_sort(F.collect_list(F.struct("ch", "cnt"))).alias("dist"),
        F.count("*").alias("n_distinct_chars"),
    )
    n = F.col("n_chars").cast("double")
    entropy = -F.aggregate(
        F.col("dist"),
        F.lit(0.0),
        lambda acc, x: acc
        + (x["cnt"].cast("double") / n)
        * F.log2(x["cnt"].cast("double") / n),
    )
    return per_doc.select(
        "doc_id",
        "n_distinct_chars",
        F.round(entropy, 6).alias("char_entropy"),
    )


D_CHAR_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, length(text) AS n_chars,
    unnest(string_split(text, '')) AS ch
  FROM documents
),
counts AS (
  SELECT doc_id, n_chars, ch, COUNT(*) AS cnt
  FROM chars WHERE ch <> '' GROUP BY doc_id, n_chars, ch
),
per_doc AS (
  SELECT doc_id, n_chars,
    list(cnt ORDER BY ch) AS cnts,
    COUNT(*) AS n_distinct_chars
  FROM counts GROUP BY doc_id, n_chars
)
SELECT doc_id, n_distinct_chars,
  ROUND(-list_reduce(
     list_prepend(0.0,
       list_transform(cnts,
         c -> (CAST(c AS DOUBLE) / n_chars) * log2(CAST(c AS DOUBLE) / n_chars))),
     (acc, x) -> acc + x), 6) AS char_entropy
FROM per_doc
ORDER BY doc_id
"""


def s_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment: salted md5 →
    uniform percent → split label; per-(lang, split) counts.

    Partition-invariant and RNG-free — re-running on any cluster
    yields the same membership (the property `sample()` lacks).
    """
    docs = load_table(spark, sf_dir, "documents")
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    pct = v % 100
    split = (
        F.when(pct < 80, "train").when(pct < 90, "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )


S_SPLIT_SQL = """
WITH assigned AS (
  SELECT lang,
    CASE
      WHEN CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)),
                                   1, 13)) AS UBIGINT) % 100 < 80 THEN 'train'
      WHEN CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)),
                                   1, 13)) AS UBIGINT) % 100 < 90 THEN 'val'
      ELSE 'test'
    END AS split
  FROM documents
)
SELECT lang, split, COUNT(*) AS n_docs
FROM assigned GROUP BY lang, split
ORDER BY lang, split
"""


PACK_BUDGET = 2000


def s_pack_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget batch packing: docs in doc_id order are packed
    into batches by running token sum (batch = floor(cumsum/budget)) —
    the O(1)-state streaming approximation of bin packing used for
    sequence-length bucketing.  One window sort is the only shuffle;
    at scale, pack within hash-partitioned shards instead of one
    global order (same operator, partitionBy added).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens")
    )
    # unbounded doc count — running token sum via the distributed
    # range-partitioned primitive instead of one global window sort
    packed = global_running_sum(
        toks, [F.col("doc_id").asc()], F.col("n_tokens"), out="cum_toks"
    ).select(
        "doc_id",
        "n_tokens",
        F.floor((F.col("cum_toks") - 1) / PACK_BUDGET).alias("batch_id"),
    )
    return (
        packed.groupBy("batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("batch_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("batch_id")
    )


S_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, n_tokens,
    CAST(floor((SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
               / {PACK_BUDGET}) AS BIGINT) AS batch_id
  FROM toks
)
SELECT batch_id, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM packed GROUP BY batch_id
ORDER BY batch_id
"""


SPECS = [
    QuerySpec("d_char_entropy", d_char_entropy, D_CHAR_ENTROPY_SQL,
              doc="per-doc Shannon character entropy (fixed-order fold)",
              tags=("text",)),
    QuerySpec("s_split_assign", s_split_assign, S_SPLIT_SQL,
              doc="deterministic hash train/val/test split counts",
              tags=("sampling",)),
    QuerySpec("s_pack_batches", s_pack_batches, S_PACK_SQL,
              doc="running-sum token-budget batch packing",
              tags=("sampling",)),
]
