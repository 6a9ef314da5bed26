"""Eighth wave: training-data curation II + robust analytics.

- **Repetition scoring** — boilerplate / keyword-stuffing / decode-loop
  detection: distinct-token ratio and top-token share per document.
- **Contamination screen** — fraction of a document's word 3-gram
  shingles that appear in a held-out benchmark split (broadcast
  semi-match; the standard eval-leakage gate before pre-training).
- **PII scrub** — email / phone / long-id regex detection + redaction
  counts (patterns written in the RE2 ∩ Java-regex subset so the same
  strings run on both engines).  The synthetic corpus contains no PII,
  so the oracle here proves cross-engine regex parity on clean text;
  the planted-fixture pytest proves the hit/redact behavior.
- **Bigram LM counts** — the n-gram language-model count kernel.
- **Embedding cluster cohesion** — per-label centroid (exact decimal
  per-dim sums) + mean member-to-centroid cosine.
- **Z-score outliers** — per-user mean/std from exact decimal power
  sums (one map-side-combinable pass), then a top-|z| scan: the
  classic two-pass distributed anomaly screen.
- **First/last/nth event** — per-user full-frame analytic window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.dedup import contamination_overlap
from idn_area_etl_spark.operators.similarity import centroid_cohesion
from idn_area_etl_spark.operators.text import (
    corpus_bigram_topk,
    pii_stats,
    repetition_stats,
)
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


def d_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs)


D_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       t -> t <> '')) AS token
  FROM documents
),
counts AS (
  SELECT doc_id, token, COUNT(*) AS cnt FROM toks GROUP BY doc_id, token
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY cnt DESC, token) AS rn
  FROM counts
)
SELECT doc_id,
  CAST(SUM(cnt) AS BIGINT) AS n_tokens,
  COUNT(*) AS n_distinct,
  MIN(CASE WHEN rn = 1 THEN token END) AS top_token,
  ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS top_share,
  ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(cnt), 6) AS dup_ratio
FROM ranked
GROUP BY doc_id
ORDER BY doc_id
"""


def d_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return contamination_overlap(docs, n=3, mod=10, top_k=20)


D_CONTAMINATION_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                t -> t <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id,
    list_distinct([array_to_string(list_slice(t, i, i + 2), ' ')
                   for i in generate_series(1, greatest(1, len(t) - 2))])
      AS shingles
  FROM toks
),
bench AS (
  SELECT DISTINCT unnest(shingles) AS shingle FROM sh WHERE doc_id % 10 = 0
),
cand AS (
  SELECT doc_id, CAST(len(shingles) AS INT) AS n_shingles,
         unnest(shingles) AS shingle
  FROM sh WHERE doc_id % 10 <> 0
)
SELECT doc_id, n_shingles, COUNT(*) AS n_overlap,
  ROUND(CAST(COUNT(*) AS DOUBLE) / n_shingles, 6) AS contamination
FROM cand JOIN bench USING (shingle)
GROUP BY doc_id, n_shingles
ORDER BY contamination DESC, doc_id
LIMIT 20
"""


def d_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pii_stats(docs)


D_PII_SQL = """
SELECT doc_id,
  CAST(len(regexp_extract_all(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(text,
    '\\b\\d{3}[-. ]\\d{3,4}[-. ]\\d{4}\\b')) AS INT) AS n_phones,
  CAST(len(regexp_extract_all(text, '\\b\\d{9,}\\b')) AS INT) AS n_long_ids,
  CAST(length(
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        '\\b\\d{3}[-. ]\\d{3,4}[-. ]\\d{4}\\b', '[PHONE]', 'g'),
      '\\b\\d{9,}\\b', '[ID]', 'g')) AS INT) AS scrubbed_len
FROM documents
ORDER BY doc_id
"""


def d_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return corpus_bigram_topk(docs, top_k=20)


D_BIGRAM_SQL = """
WITH toks AS (
  SELECT list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     t -> t <> '') AS t
  FROM documents
),
bg AS (
  SELECT unnest([t[i] || ' ' || t[i + 1]
                 for i in generate_series(1, len(t) - 1)]) AS bigram
  FROM toks
)
SELECT bigram, COUNT(*) AS cnt
FROM bg GROUP BY bigram
ORDER BY cnt DESC, bigram
LIMIT 20
"""


def a_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_cohesion(emb)


A_LABEL_COHESION_SQL = """
WITH e AS (
  SELECT label,
    CAST(unnest(embedding) AS DOUBLE) AS val,
    generate_subscripts(embedding, 1) AS pos
  FROM embeddings
),
sums AS (
  SELECT label, pos,
    CAST(SUM(CAST(val AS DECIMAL(32,14))) AS DOUBLE) AS s,
    COUNT(*) AS n
  FROM e GROUP BY label, pos
),
cent AS (
  SELECT label, list(s / CAST(n AS DOUBLE) ORDER BY pos) AS centroid
  FROM sums GROUP BY label
),
v AS (
  SELECT label, vec_id, [CAST(x AS DOUBLE) for x in embedding] AS vec
  FROM embeddings
),
d AS (
  SELECT v.label, vec, centroid,
    sqrt(list_sum(list_transform(vec, x -> x * x)))
      * sqrt(list_sum(list_transform(centroid, x -> x * x))) AS denom
  FROM v JOIN cent USING (label)
),
m AS (
  SELECT label,
    ROUND(
      list_sum(list_transform(generate_series(1, len(vec)),
                              i -> vec[i] * centroid[i])) / denom,
    9) AS c9
  FROM d WHERE denom > 0
)
SELECT label, COUNT(*) AS n_members,
  ROUND(CAST(SUM(CAST(c9 AS DECIMAL(20,10))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS cohesion
FROM m GROUP BY label
ORDER BY label
"""


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 per-user z-score outlier events.

    Pass 1: per-user count / sum / sum-of-squares through exact
    decimals (map-side combinable, one small shuffle).  Pass 2: join
    the per-user stats back (stats side is tiny → broadcast) and rank
    |z|.  Bit-deterministic under any partitioning.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    stats = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(v.cast("decimal(30,6)")).cast("double").alias("s"),
            F.sum((v * v).cast("decimal(30,6)")).cast("double").alias("ss"),
        )
        .filter(F.col("n") >= 20)
    )
    n = F.col("n").cast("double")
    mean = F.col("s") / n
    var = F.col("ss") / n - mean * mean
    stats = stats.select(
        "user_id", mean.alias("mean"), F.sqrt(var).alias("std")
    ).filter(F.col("std") > 0)
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(stats, "user_id")
        .select(
            "event_id",
            "user_id",
            "value",
            F.round(z, 6).alias("zscore"),
        )
        .orderBy(F.abs(F.col("zscore")).desc(), "event_id")
        .limit(50)
    )


Q_VALUE_OUTLIERS_SQL = """
WITH sums AS (
  SELECT user_id, COUNT(*) AS n,
    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s,
    CAST(SUM(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE) AS ss
  FROM events GROUP BY user_id
  HAVING COUNT(*) >= 20
),
stats AS (
  SELECT user_id, s / CAST(n AS DOUBLE) AS mean,
    sqrt(ss / CAST(n AS DOUBLE)
         - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE))) AS std
  FROM sums
)
SELECT event_id, e.user_id, value,
  ROUND((value - mean) / std, 6) AS zscore
FROM events e JOIN stats USING (user_id)
WHERE std > 0
ORDER BY abs(ROUND((value - mean) / std, 6)) DESC, event_id
LIMIT 50
"""


def w_first_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user first / second / last event type via one full-frame
    analytic window (single shuffle on user_id)."""
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = order.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        ev.select(
            "user_id",
            F.row_number().over(order).alias("rn"),
            F.count("*").over(full).alias("n_events"),
            F.first("event_type").over(full).alias("first_type"),
            F.nth_value("event_type", 2).over(full).alias("second_type"),
            F.last("event_type").over(full).alias("last_type"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


W_FIRST_LAST_SQL = """
SELECT user_id,
  COUNT(*) OVER w AS n_events,
  FIRST_VALUE(event_type) OVER w AS first_type,
  NTH_VALUE(event_type, 2) OVER w AS second_type,
  LAST_VALUE(event_type) OVER w AS last_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) = 1
ORDER BY user_id
"""


SPECS = [
    QuerySpec("d_repetition_score", d_repetition_score, D_REPETITION_SQL,
              doc="repetition/boilerplate metrics per document",
              tags=("text", "dedup")),
    QuerySpec("d_contamination", d_contamination, D_CONTAMINATION_SQL,
              doc="benchmark-contamination shingle overlap screen",
              tags=("text", "dedup")),
    QuerySpec("d_pii_scrub", d_pii_scrub, D_PII_SQL,
              doc="PII detection/redaction counts (regex parity)",
              tags=("text",)),
    QuerySpec("d_bigram_counts", d_bigram_counts, D_BIGRAM_SQL,
              doc="top-20 corpus token bigrams (n-gram LM counts)",
              tags=("text",)),
    QuerySpec("a_label_cohesion", a_label_cohesion, A_LABEL_COHESION_SQL,
              doc="per-label centroid + mean member cosine",
              tags=("similarity",)),
    QuerySpec("q_value_outliers", q_value_outliers, Q_VALUE_OUTLIERS_SQL,
              doc="two-pass z-score outlier events",
              tags=("analytics",)),
    QuerySpec("w_first_last_event", w_first_last_event, W_FIRST_LAST_SQL,
              doc="first/second/last event per user (full-frame window)",
              tags=("window",)),
]
