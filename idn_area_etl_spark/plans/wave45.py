"""Forty-fifth wave: hard-negative mining, l-diversity, interval
coverage, and the cross-source contamination matrix.

Reference parity note: training-data / privacy / event-analytics
extensions beyond the reference's ETL surface; every query carries an
exact DuckDB oracle.

- **Hard-negative mining** (`e_hard_negatives`) — the contrastive-
  learning batch-prep primitive: for each query vector, the top-3
  most-cosine-similar vectors with a DIFFERENT label.  The query
  side is broadcast; ranking shuffles on query_id only.
- **l-diversity** (`q_l_diversity`) — the disclosure-risk audit one
  step past k-anonymity (wave16): distribution of distinct
  sensitive values (mktsegment) within quasi-identifier groups
  (nation x acctbal-thousand band); l=1 groups are attribute-
  disclosure risks.
- **Interval coverage** (`q_interval_coverage`) — union-of-intervals
  per user (each event opens a 300 s activity window): classic
  gaps-and-islands with a running max end, all in integer epoch
  seconds.  Complements q_max_concurrency (sweep) with the merged-
  length view.
- **Cross-source contamination matrix** (`d_source_overlap`) — the
  provenance-dedup report: near-duplicate pairs (5-gram-shingle
  Jaccard >= 0.8, the wave-44 prefix join) rolled up by unordered
  source pair — which feeds duplicate which.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.dedup import prefix_jaccard_join
from idn_area_etl_spark.operators.similarity import (
    as_double_vec,
    dot_expr,
    norm_expr,
)
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


# ------------------------------------------------------------------ #
# e_hard_negatives
# ------------------------------------------------------------------ #


def e_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 different-label nearest neighbors by cosine for each
    query vector (vec_id < 50)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", "label", as_double_vec(F.col("embedding")).alias("_vec")
    ).withColumn("_nrm", norm_expr(F.col("_vec")))
    q = v.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("_vec").alias("_qvec"),
        F.col("_nrm").alias("_qnrm"),
    )
    c = v.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("_vec").alias("_cvec"),
        F.col("_nrm").alias("_cnrm"),
    )
    cos = F.round(
        dot_expr(F.col("_qvec"), F.col("_cvec"))
        / (F.col("_qnrm") * F.col("_cnrm")),
        6,
    )
    from idn_area_etl_spark.operators.ranks import grouped_topk

    scored = c.join(
        F.broadcast(q),
        F.col("query_label") != F.col("neighbor_label"),
        "inner",
    ).select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        cos.alias("cosine"),
    )
    # two-phase salted top-k (r6): candidates are corpus-scale per query
    return grouped_topk(
        scored,
        ["query_id"],
        [F.desc("cosine"), F.col("neighbor_id")],
        3,
        salt_key=F.col("neighbor_id"),
    ).orderBy("query_id", "rnk")


E_HARDNEG_SQL = """
WITH v AS (
  SELECT vec_id, label,
    [CAST(x AS DOUBLE) for x in embedding] AS vec
  FROM embeddings
),
norms AS (
  SELECT vec_id, label, vec,
    sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
  FROM v
),
pairs AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
    c.vec_id AS neighbor_id, c.label AS neighbor_label,
    ROUND(list_sum(list_transform(generate_series(1, len(q.vec)),
                   i -> q.vec[i] * c.vec[i])) / (q.nrm * c.nrm), 6)
      AS cosine
  FROM norms q JOIN norms c ON q.label <> c.label
  WHERE q.vec_id < 50
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM pairs
)
SELECT query_id, query_label, neighbor_id, neighbor_label, cosine,
  CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
ORDER BY query_id, rnk
"""


# ------------------------------------------------------------------ #
# q_l_diversity
# ------------------------------------------------------------------ #


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of sensitive-attribute diversity l across
    quasi-identifier groups (nation x acctbal-thousand band)."""
    cust = load_table(spark, sf_dir, "customer")
    groups = (
        cust.select(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000).alias("bal_band"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "bal_band")
        .agg(
            F.count("*").alias("n_members"),
            F.countDistinct("c_mktsegment").alias("l"),
        )
    )
    return (
        groups.groupBy("l")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum(F.col("n_members").cast("decimal(20,0)"))
            .cast("long")
            .alias("n_customers"),
        )
        .orderBy("l")
    )


Q_LDIV_SQL = """
WITH groups AS (
  SELECT c_nationkey, FLOOR(c_acctbal / 1000) AS bal_band,
    COUNT(*) AS n_members,
    COUNT(DISTINCT c_mktsegment) AS l
  FROM customer GROUP BY 1, 2
)
SELECT l, CAST(COUNT(*) AS BIGINT) AS n_groups,
  CAST(SUM(CAST(n_members AS DECIMAL(20,0))) AS BIGINT) AS n_customers
FROM groups GROUP BY l ORDER BY l
"""


# ------------------------------------------------------------------ #
# q_interval_coverage
# ------------------------------------------------------------------ #


def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged activity coverage per user: each event opens a 300 s
    window; overlapping windows merge (gaps-and-islands)."""
    ev = load_table(spark, sf_dir, "events")
    # exact integer microseconds: epoch-seconds casts round vs
    # truncate differently across engines on fractional timestamps
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 300_000_000).alias("e"),
    )
    w_order = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), 1
        ).otherwise(0),
    ).withColumn(
        "island_id",
        F.sum("new_island").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = flagged.groupBy("user_id", "island_id").agg(
        F.min("s").alias("start_s"),
        F.max("e").alias("end_s"),
        F.count("*").alias("n_ev"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.sum("n_ev").cast("long").alias("n_events"),
            F.count("*").alias("n_islands"),
            F.sum(F.col("end_s") - F.col("start_s"))
            .cast("long")
            .alias("covered_us"),
        )
        .orderBy("user_id")
    )


Q_COVER_SQL = """
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
    epoch_us(ts) + 300000000 AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
    CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      THEN 1 ELSE 0 END AS new_island,
    event_id
  FROM iv
),
ids AS (
  SELECT user_id, s, e,
    SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
  FROM flagged
),
islands AS (
  SELECT user_id, island_id, MIN(s) AS start_s, MAX(e) AS end_s,
    COUNT(*) AS n_ev
  FROM ids GROUP BY 1, 2
)
SELECT user_id,
  CAST(SUM(n_ev) AS BIGINT) AS n_events,
  CAST(COUNT(*) AS BIGINT) AS n_islands,
  CAST(SUM(end_s - start_s) AS BIGINT) AS covered_us
FROM islands GROUP BY user_id ORDER BY user_id
"""


# ------------------------------------------------------------------ #
# d_source_overlap
# ------------------------------------------------------------------ #


def d_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplicate matrix: wave-44 prefix-join pairs
    rolled up by unordered source pair."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = prefix_jaccard_join(docs, n=5, tau_num=4, tau_den=5)
    src = docs.select("doc_id", "source")
    s1 = src.select(
        F.col("doc_id").alias("doc1"), F.col("source").alias("src1")
    )
    s2 = src.select(
        F.col("doc_id").alias("doc2"), F.col("source").alias("src2")
    )
    return (
        pairs.join(s1, "doc1")
        .join(s2, "doc2")
        .select(
            F.least("src1", "src2").alias("source_a"),
            F.greatest("src1", "src2").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


D_SRC_OVERLAP_SQL = r"""
WITH tok AS (
  SELECT doc_id, source,
    list_distinct([array_to_string(ws[i:i+4], ' ')
                   for i in generate_series(1, len(ws) - 4)]) AS sh
  FROM (
    SELECT doc_id, source,
      list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                  x -> x <> '') AS ws
    FROM documents
  )
  WHERE len(ws) >= 5
),
ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
inter AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc1, doc2
  FROM inter
  JOIN (SELECT doc_id, len(sh) AS n FROM tok) na ON doc1 = na.doc_id
  JOIN (SELECT doc_id, len(sh) AS n FROM tok) nb ON doc2 = nb.doc_id
  WHERE i * 5 >= (na.n + nb.n - i) * 4
)
SELECT least(t1.source, t2.source) AS source_a,
  greatest(t1.source, t2.source) AS source_b,
  CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs
JOIN tok t1 ON doc1 = t1.doc_id
JOIN tok t2 ON doc2 = t2.doc_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


SPECS = [
    QuerySpec(
        "e_hard_negatives",
        e_hard_negatives,
        E_HARDNEG_SQL,
        doc="top-3 different-label cosine neighbors (contrastive mining)",
        tags=("embedding", "similarity", "dataset-prep"),
    ),
    QuerySpec(
        "q_l_diversity",
        q_l_diversity,
        Q_LDIV_SQL,
        doc="l-diversity distribution over quasi-identifier groups",
        tags=("privacy",),
    ),
    QuerySpec(
        "q_interval_coverage",
        q_interval_coverage,
        Q_COVER_SQL,
        doc="merged 300s activity-interval coverage per user",
        tags=("events", "window"),
    ),
    QuerySpec(
        "d_source_overlap",
        d_source_overlap,
        D_SRC_OVERLAP_SQL,
        doc="cross-source near-dup contamination matrix",
        tags=("dedup", "report"),
    ),
]
