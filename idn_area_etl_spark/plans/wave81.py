"""Eighty-first wave: RAG chunking, partial correlation, and
intraclass correlation.

Reference parity note: retrieval-prep + conditional dependence +
cluster-design statistics; every query carries an exact DuckDB
oracle.

- **RAG chunking** (`s_rag_chunking`) — the retrieval-ingestion
  shape: split every document into 64-token windows with 16-token
  overlap (stride 48), materialize the chunks declaratively
  (sequence + slice — no UDF), and report per-language chunk
  counts, mean chunk tokens, and the expansion factor.  The chunk
  generator is the exact plan a RAG pipeline runs before embedding.
- **Partial correlation** (`a_partial_correlation`) — spend vs
  balance CONTROLLING for order count: r_xy.z from the three
  pairwise Pearson correlations, each from exact decimal moments.
  Separates "rich customers buy more" from "frequent customers buy
  more".
- **ICC** (`a_icc`) — intraclass correlation ICC(1) of balance
  within nations from the ANOVA mean squares ((MSB - MSW) /
  (MSB + (k0 - 1) MSW), k0 the average-ish cluster size): the
  design-effect input for cluster-randomized experiments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table

_CHUNK, _OVERLAP = 64, 16
_STRIDE = _CHUNK - _OVERLAP


# ------------------------------------------------------------------ #
# s_rag_chunking
# ------------------------------------------------------------------ #


def s_rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token / 16-overlap chunking; per-language chunk stats."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    base = docs.select(
        "doc_id", "lang", toks.alias("ws"), F.size(toks).alias("n")
    ).filter(F.col("n") > 0)
    # chunk start positions: 1, 1+stride, ... while start <= n
    chunks = base.select(
        "doc_id",
        "lang",
        "n",
        F.explode(
            F.sequence(
                F.lit(1), F.col("n"), F.lit(_STRIDE)
            )
        ).alias("start"),
    ).select(
        "doc_id",
        "lang",
        "n",
        "start",
        F.least(
            F.lit(_CHUNK), F.col("n") - F.col("start") + 1
        ).alias("chunk_len"),
    )
    return (
        chunks.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_chunks"),
            F.round(
                F.sum(F.col("chunk_len").cast("decimal(20,0)"))
                .cast("double")
                / F.count("*"),
                6,
            ).alias("mean_chunk_tokens"),
            F.round(
                F.sum(F.col("chunk_len").cast("decimal(20,0)"))
                .cast("double")
                / F.sum(
                    F.when(
                        F.col("start") == 1,
                        F.col("n").cast("decimal(20,0)"),
                    ).otherwise(F.lit(0).cast("decimal(20,0)"))
                ).cast("double"),
                6,
            ).alias("expansion_factor"),
        )
        .orderBy("lang")
    )


S_CHUNK_SQL = rf"""
WITH base AS (
  SELECT doc_id, lang, ws, len(ws) AS n
  FROM (
    SELECT doc_id, lang,
      list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                  x -> x <> '') AS ws
    FROM documents
  )
  WHERE len(ws) > 0
),
chunks AS (
  SELECT doc_id, lang, n, start,
    LEAST({_CHUNK}, n - start + 1) AS chunk_len
  FROM (
    SELECT doc_id, lang, n,
      unnest(generate_series(1, n, {_STRIDE})) AS start
    FROM base
  )
)
SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_chunks,
  ROUND(CAST(SUM(CAST(chunk_len AS DECIMAL(20,0))) AS DOUBLE)
        / COUNT(*), 6) AS mean_chunk_tokens,
  ROUND(CAST(SUM(CAST(chunk_len AS DECIMAL(20,0))) AS DOUBLE)
    / CAST(SUM(CASE WHEN start = 1
        THEN CAST(n AS DECIMAL(20,0))
        ELSE CAST(0 AS DECIMAL(20,0)) END) AS DOUBLE), 6)
    AS expansion_factor
FROM chunks GROUP BY lang ORDER BY lang
"""


# ------------------------------------------------------------------ #
# a_partial_correlation
# ------------------------------------------------------------------ #


def a_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial corr of spend (y) and balance (x) given order count
    (z)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.count("*").alias("z"),
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).alias("yv"),
    )
    base = cust.join(per, cust.c_custkey == per.o_custkey).select(
        F.col("c_acctbal").cast("double").alias("x"),
        F.col("yv").cast("double").alias("y"),
        F.col("z").cast("double").alias("z"),
    )
    m = base.agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.col(c).cast("decimal(27,6)")).alias(f"s_{c}")
            for c in ("x", "y", "z")
        ],
        *[
            F.sum(
                (F.col(a) * F.col(b)).cast("decimal(38,8)")
            ).alias(f"s_{a}{b}")
            for a, b in (
                ("x", "x"),
                ("y", "y"),
                ("z", "z"),
                ("x", "y"),
                ("x", "z"),
                ("y", "z"),
            )
        ],
    )
    cols = {c: F.col(f"s_{c}").cast("double") for c in ("x", "y", "z")}
    prods = {
        p: F.col(f"s_{p}").cast("double")
        for p in ("xx", "yy", "zz", "xy", "xz", "yz")
    }
    n = F.col("n")

    def corr(ab, a, b, aa, bb):
        num = n * prods[ab] - cols[a] * cols[b]
        den = F.sqrt(
            (n * prods[aa] - cols[a] * cols[a])
            * (n * prods[bb] - cols[b] * cols[b])
        )
        return num / den

    rxy = corr("xy", "x", "y", "xx", "yy")
    rxz = corr("xz", "x", "z", "xx", "zz")
    ryz = corr("yz", "y", "z", "yy", "zz")
    partial = (rxy - rxz * ryz) / F.sqrt(
        (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(rxy, 6).alias("r_xy"),
        F.round(rxz, 6).alias("r_xz"),
        F.round(ryz, 6).alias("r_yz"),
        F.round(partial, 6).alias("partial_r_xy_given_z"),
    )


A_PARTIAL_SQL = """
WITH per AS (
  SELECT o_custkey, COUNT(*) AS z,
    SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS yv
  FROM orders GROUP BY o_custkey
),
base AS (
  SELECT CAST(c_acctbal AS DOUBLE) AS x, CAST(yv AS DOUBLE) AS y,
    CAST(z AS DOUBLE) AS z
  FROM customer JOIN per ON c_custkey = o_custkey
),
m AS (
  SELECT COUNT(*) AS n,
    CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(y AS DECIMAL(27,6))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(z AS DECIMAL(27,6))) AS DOUBLE) AS sz,
    CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(y * y AS DECIMAL(38,8))) AS DOUBLE) AS syy,
    CAST(SUM(CAST(z * z AS DECIMAL(38,8))) AS DOUBLE) AS szz,
    CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(x * z AS DECIMAL(38,8))) AS DOUBLE) AS sxz,
    CAST(SUM(CAST(y * z AS DECIMAL(38,8))) AS DOUBLE) AS syz
  FROM base
)
SELECT CAST(n AS BIGINT) AS n,
  ROUND((n * sxy - sx * sy)
    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r_xy,
  ROUND((n * sxz - sx * sz)
    / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)), 6) AS r_xz,
  ROUND((n * syz - sy * sz)
    / sqrt((n * syy - sy * sy) * (n * szz - sz * sz)), 6) AS r_yz,
  ROUND(((n * sxy - sx * sy)
      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    - ((n * sxz - sx * sz)
       / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)))
      * ((n * syz - sy * sz)
         / sqrt((n * syy - sy * sy) * (n * szz - sz * sz))))
    / sqrt((1.0 - ((n * sxz - sx * sz)
          / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)))
        * ((n * sxz - sx * sz)
           / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz))))
      * (1.0 - ((n * syz - sy * sz)
          / sqrt((n * syy - sy * sy) * (n * szz - sz * sz)))
        * ((n * syz - sy * sz)
           / sqrt((n * syy - sy * sy) * (n * szz - sz * sz))))),
    6) AS partial_r_xy_given_z
FROM m
"""


# ------------------------------------------------------------------ #
# a_icc
# ------------------------------------------------------------------ #


def a_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICC(1) of customer balance within nations (ANOVA MS form)."""
    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(27,6)")).alias("s"),
        F.sum(
            (F.col("c_acctbal") * F.col("c_acctbal")).cast(
                "decimal(38,10)"
            )
        ).alias("ss"),
    )
    tot = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("N"),
        F.sum("s").cast("double").alias("S"),
        F.sum("ss").cast("double").alias("SS"),
        F.sum(
            (
                (F.col("s").cast("double") * F.col("s").cast("double"))
                / F.col("n")
            ).cast("decimal(38,10)")
        ).cast("double").alias("sum_s2n"),
        F.sum(
            (F.col("n").cast("double") * F.col("n")).cast(
                "decimal(38,4)"
            )
        ).cast("double").alias("sum_n2"),
    )
    ssb = F.col("sum_s2n") - F.col("S") * F.col("S") / F.col("N")
    ssw = F.col("SS") - F.col("sum_s2n")
    msb = ssb / (F.col("k") - 1)
    msw = ssw / (F.col("N") - F.col("k"))
    # ANOVA-balanced-equivalent cluster size k0
    k0 = (
        F.col("N").cast("double")
        - F.col("sum_n2") / F.col("N")
    ) / (F.col("k") - 1)
    icc = (msb - msw) / (msb + (k0 - 1.0) * msw)
    return tot.select(
        F.col("k").cast("long").alias("k_clusters"),
        F.col("N").cast("long").alias("n_total"),
        F.round(k0, 6).alias("k0"),
        F.round(icc, 6).alias("icc1"),
    )


A_ICC_SQL = """
WITH g AS (
  SELECT c_nationkey, COUNT(*) AS n,
    SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS s,
    SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(38,10))) AS ss
  FROM customer GROUP BY c_nationkey
),
tot AS (
  SELECT COUNT(*) AS k, SUM(n) AS N,
    CAST(SUM(s) AS DOUBLE) AS S, CAST(SUM(ss) AS DOUBLE) AS SS,
    CAST(SUM(CAST(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
         AS DECIMAL(38,10))) AS DOUBLE) AS sum_s2n,
    CAST(SUM(CAST(CAST(n AS DOUBLE) * n AS DECIMAL(38,4)))
         AS DOUBLE) AS sum_n2
  FROM g
)
SELECT CAST(k AS BIGINT) AS k_clusters, CAST(N AS BIGINT) AS n_total,
  ROUND((CAST(N AS DOUBLE) - sum_n2 / N) / (k - 1), 6) AS k0,
  ROUND(((sum_s2n - S * S / N) / (k - 1)
      - (SS - sum_s2n) / (N - k))
    / ((sum_s2n - S * S / N) / (k - 1)
      + ((CAST(N AS DOUBLE) - sum_n2 / N) / (k - 1) - 1.0)
        * ((SS - sum_s2n) / (N - k))), 6) AS icc1
FROM tot
"""


SPECS = [
    QuerySpec(
        "s_rag_chunking",
        s_rag_chunking,
        S_CHUNK_SQL,
        doc="64/16 overlap RAG chunking; per-language chunk stats",
        tags=("text", "dataset-prep"),
    ),
    QuerySpec(
        "a_partial_correlation",
        a_partial_correlation,
        A_PARTIAL_SQL,
        doc="partial corr of spend~balance controlling order count",
        tags=("stats",),
    ),
    QuerySpec(
        "a_icc",
        a_icc,
        A_ICC_SQL,
        doc="ICC(1) of balance within nations (cluster-design input)",
        tags=("stats", "experimentation"),
    ),
]
