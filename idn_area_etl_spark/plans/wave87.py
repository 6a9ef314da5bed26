"""Eighty-seventh wave: Wilcoxon signed-rank, frequency spectrum,
and strongest triangles.

Reference parity note: paired nonparametric testing + lexical
statistics + weighted graph motifs; every query carries an exact
DuckDB oracle.

- **Wilcoxon signed-rank** (`a_wilcoxon_signed`) — the PAIRED
  nonparametric test: each user's post-minus-pre value difference
  (zeros dropped) ranked by |difference| with tie-aware average
  ranks; W+ = sum of positive-difference ranks, z from the normal
  approximation.  Complements the unpaired Mann-Whitney family.
- **Frequency spectrum** (`d_freq_spectrum`) — the lexical
  statistician's spectrum: how many vocabulary types occur exactly
  1, 2, 3, 4, or 5+ times per language (hapax/dis/tris legomena) —
  the Zipf companion that drives Good-Turing smoothing.
- **Top triangles** (`g_top_triangles`) — the strongest co-purchase
  triangles ranked by their weakest edge's co-occurrence (the
  bottleneck weight), top 10: the motif listing behind bundle
  suggestions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import global_running_sum
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


# ------------------------------------------------------------------ #
# a_wilcoxon_signed
# ------------------------------------------------------------------ #


def a_wilcoxon_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank of post vs pre user value (cut at
    2024-01-16), normal approximation."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("date")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.to_date("ts") < cut,
                F.col("value").cast("decimal(20,6)"),
            ).otherwise(F.lit(0).cast("decimal(20,6)"))
        ).cast("double").alias("pre"),
        F.sum(
            F.when(
                F.to_date("ts") >= cut,
                F.col("value").cast("decimal(20,6)"),
            ).otherwise(F.lit(0).cast("decimal(20,6)"))
        ).cast("double").alias("post"),
    )
    diffs = per_user.select(
        (F.col("post") - F.col("pre")).alias("diff")
    ).filter(F.col("diff") != 0)
    rolled = diffs.select(
        F.abs("diff").alias("ad"),
        (F.col("diff") > 0).cast("long").alias("pos"),
    ).groupBy("ad").agg(
        F.count("*").alias("n"), F.sum("pos").alias("npos")
    )
    # distinct-|diff| cardinality is unbounded — distributed running
    # sum (inclusive minus own group), not a single-partition window
    ranked = global_running_sum(
        rolled, [F.col("ad").asc()], F.col("n"), out="cum_incl"
    ).select(
        "n",
        "npos",
        (
            (F.col("cum_incl") - F.col("n")).cast("double")
            + (F.col("n").cast("double") + 1.0) / 2.0
        ).alias("avg_rank"),
    )
    agg = ranked.agg(
        F.sum("n").alias("m"),
        F.sum(
            (F.col("npos").cast("double") * F.col("avg_rank")).cast(
                "decimal(28,6)"
            )
        )
        .cast("double")
        .alias("w_plus"),
    )
    m = F.col("m").cast("double")
    mu = m * (m + 1.0) / 4.0
    sigma = F.sqrt(m * (m + 1.0) * (2.0 * m + 1.0) / 24.0)
    return agg.select(
        F.col("m").cast("long").alias("n_nonzero"),
        F.round(F.col("w_plus"), 4).alias("w_plus"),
        F.round(mu, 4).alias("expected_w"),
        F.round((F.col("w_plus") - mu) / sigma, 6).alias("z"),
    )


A_WILCOXON_SQL = """
WITH per_user AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
      THEN CAST(value AS DECIMAL(20,6))
      ELSE CAST(0 AS DECIMAL(20,6)) END) AS DOUBLE) AS pre,
    CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
      THEN CAST(value AS DECIMAL(20,6))
      ELSE CAST(0 AS DECIMAL(20,6)) END) AS DOUBLE) AS post
  FROM events GROUP BY user_id
),
diffs AS (
  SELECT post - pre AS diff FROM per_user WHERE post - pre <> 0
),
rolled AS (
  SELECT ABS(diff) AS ad, COUNT(*) AS n,
    SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS npos
  FROM diffs GROUP BY ABS(diff)
),
ranked AS (
  SELECT n, npos,
    CAST(COALESCE(SUM(n) OVER (ORDER BY ad
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS DOUBLE) + (CAST(n AS DOUBLE) + 1.0) / 2.0 AS avg_rank
  FROM rolled
),
agg AS (
  SELECT SUM(n) AS m,
    CAST(SUM(CAST(CAST(npos AS DOUBLE) * avg_rank
         AS DECIMAL(28,6))) AS DOUBLE) AS w_plus
  FROM ranked
)
SELECT CAST(m AS BIGINT) AS n_nonzero,
  ROUND(w_plus, 4) AS w_plus,
  ROUND(CAST(m AS DOUBLE) * (m + 1.0) / 4.0, 4) AS expected_w,
  ROUND((w_plus - CAST(m AS DOUBLE) * (m + 1.0) / 4.0)
    / sqrt(CAST(m AS DOUBLE) * (m + 1.0) * (2.0 * m + 1.0) / 24.0),
    6) AS z
FROM agg
"""


# ------------------------------------------------------------------ #
# d_freq_spectrum
# ------------------------------------------------------------------ #


def d_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary frequency spectrum per language (1/2/3/4/5+)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    counts = (
        docs.select("lang", F.explode(toks).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("c"))
    )
    spectrum = counts.select(
        "lang",
        F.when(F.col("c") >= 5, F.lit(5)).otherwise(F.col("c")).alias(
            "freq_class"
        ),
    )
    return (
        spectrum.groupBy("lang", "freq_class")
        .agg(F.count("*").alias("n_types"))
        .orderBy("lang", "freq_class")
    )


D_SPECTRUM_SQL = r"""
WITH counts AS (
  SELECT lang, w, COUNT(*) AS c
  FROM (
    SELECT lang, unnest(
      list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                  x -> x <> '')) AS w
    FROM documents
  )
  GROUP BY lang, w
)
SELECT lang,
  CASE WHEN c >= 5 THEN 5 ELSE c END AS freq_class,
  CAST(COUNT(*) AS BIGINT) AS n_types
FROM counts GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------------------------------ #
# g_top_triangles
# ------------------------------------------------------------------ #


def g_top_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 co-purchase triangles by bottleneck edge weight."""
    li = load_table(spark, sf_dir, "lineitem")
    from idn_area_etl_spark.operators.graph import co_purchase_edges

    # r8-opt: the edge build is the staged shared co-purchase
    # subtree (see co_purchase_edges) — previously re-expanded per
    # downstream consumer
    edges = co_purchase_edges(li, min_co=2, keep_weight=True)
    e1 = edges.select(
        F.col("p1").alias("x"), F.col("p2").alias("y"),
        F.col("co").alias("w_xy"),
    )
    e2 = edges.select(
        F.col("p1").alias("y"), F.col("p2").alias("z"),
        F.col("co").alias("w_yz"),
    )
    e3 = edges.select(
        F.col("p1").alias("x"), F.col("p2").alias("z"),
        F.col("co").alias("w_xz"),
    )
    tri = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .select(
            "x",
            "y",
            "z",
            F.least("w_xy", "w_yz", "w_xz").alias("bottleneck"),
        )
    )
    return (
        tri.orderBy(F.desc("bottleneck"), "x", "y", "z")
        .limit(10)
    )


G_TOPTRI_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS co
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
tri AS (
  SELECT e1.p1 AS x, e1.p2 AS y, e2.p2 AS z,
    LEAST(e1.co, e2.co, e3.co) AS bottleneck
  FROM edges e1
  JOIN edges e2 ON e1.p2 = e2.p1
  JOIN edges e3 ON e1.p1 = e3.p1 AND e2.p2 = e3.p2
)
SELECT x, y, z, CAST(bottleneck AS BIGINT) AS bottleneck
FROM tri ORDER BY bottleneck DESC, x, y, z LIMIT 10
"""


SPECS = [
    QuerySpec(
        "a_wilcoxon_signed",
        a_wilcoxon_signed,
        A_WILCOXON_SQL,
        doc="paired Wilcoxon signed-rank of post vs pre user value",
        tags=("stats", "experimentation"),
    ),
    QuerySpec(
        "d_freq_spectrum",
        d_freq_spectrum,
        D_SPECTRUM_SQL,
        doc="vocab frequency spectrum (hapax..5+) per language",
        tags=("text",),
    ),
    QuerySpec(
        "g_top_triangles",
        g_top_triangles,
        G_TOPTRI_SQL,
        doc="top-10 co-purchase triangles by bottleneck edge weight",
        tags=("graph", "recommender"),
    ),
]
