"""Fifty-eighth wave: regression discontinuity, curriculum
interleaving, and degree assortativity.

Reference parity note: causal-inference + training-curriculum +
graph-metric extensions; every query carries an exact DuckDB oracle.

- **Regression discontinuity** (`a_regression_discontinuity`) —
  sharp RDD at the 2024-01-16 cutoff on daily total event value:
  separate local-linear fits on +/-10-day windows on each side
  (exact decimal moments), the causal jump = difference of the two
  fitted intercepts AT the cutoff.
- **Curriculum interleave** (`s_curriculum_interleave`) — order
  documents easiest-first within language (doc length as the
  difficulty proxy), then round-robin across languages (global order = (within-lang
  rank, lang)); report the language mix per schedule decile, which
  pins both the difficulty ordering and the interleave balance.
- **Degree assortativity** (`g_degree_assortativity`) — Pearson
  correlation of endpoint degrees over co-purchase edges (both
  orientations, the standard Newman definition): do high-degree
  parts co-occur with high-degree parts?  Degrees come from one
  aggregation; the correlation is integer sums until the final
  expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import global_row_number, grouped_row_number
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


# ------------------------------------------------------------------ #
# a_regression_discontinuity
# ------------------------------------------------------------------ #


def a_regression_discontinuity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sharp RDD on daily total value at 2024-01-16, +/-10-day local
    linear fits; jump = right intercept - left intercept at cutoff."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-16")).alias("x")
    ).agg(
        F.sum(F.col("value").cast("decimal(27,6)"))
        .cast("double")
        .alias("y")
    ).filter((F.col("x") >= -10) & (F.col("x") <= 9))
    sided = daily.select(
        (F.col("x") >= 0).cast("int").alias("side"),
        F.col("x").cast("double").alias("x"),
        "y",
    )
    moments = sided.groupBy("side").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(27,6)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(27,6)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,10)")).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,10)")).alias("sxy"),
    ).select(
        "side",
        "n",
        F.col("sx").cast("double").alias("sx"),
        F.col("sy").cast("double").alias("sy"),
        F.col("sxx").cast("double").alias("sxx"),
        F.col("sxy").cast("double").alias("sxy"),
    )
    beta = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    alpha = F.col("sy") / F.col("n") - beta * F.col("sx") / F.col("n")
    fitted = moments.select(
        "side",
        F.round(alpha, 6).alias("intercept_at_cutoff"),
        F.round(beta, 6).alias("slope"),
    )
    left = fitted.filter(F.col("side") == 0).select(
        F.col("intercept_at_cutoff").alias("left_icpt"),
        F.col("slope").alias("left_slope"),
    )
    right = fitted.filter(F.col("side") == 1).select(
        F.col("intercept_at_cutoff").alias("right_icpt"),
        F.col("slope").alias("right_slope"),
    )
    return left.crossJoin(right).select(
        "left_icpt",
        "left_slope",
        "right_icpt",
        "right_slope",
        F.round(F.col("right_icpt") - F.col("left_icpt"), 6).alias(
            "rdd_jump"
        ),
    )


A_RDD_SQL = """
WITH daily AS (
  SELECT datediff('day', DATE '2024-01-16', CAST(ts AS DATE)) AS x,
    CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS y
  FROM events GROUP BY 1
),
sided AS (
  SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS side,
    CAST(x AS DOUBLE) AS x, y
  FROM daily WHERE x BETWEEN -10 AND 9
),
moments AS (
  SELECT side, COUNT(*) AS n,
    CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(y AS DECIMAL(27,6))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy
  FROM sided GROUP BY side
),
fitted AS (
  SELECT side,
    ROUND(sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx / n,
          6) AS icpt,
    ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS slope
  FROM moments
)
SELECT l.icpt AS left_icpt, l.slope AS left_slope,
  r.icpt AS right_icpt, r.slope AS right_slope,
  ROUND(r.icpt - l.icpt, 6) AS rdd_jump
FROM (SELECT * FROM fitted WHERE side = 0) l
CROSS JOIN (SELECT * FROM fitted WHERE side = 1) r
"""


# ------------------------------------------------------------------ #
# s_curriculum_interleave
# ------------------------------------------------------------------ #


def s_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Easiest-first curriculum (doc length as the difficulty proxy,
    ascending) interleaved round-robin across languages; language mix
    per schedule decile."""
    docs = load_table(spark, sf_dir, "documents")
    # languages are few but huge: grouped_row_number splits each giant
    # language across range partitions; the interleave position is the
    # distributed global rank over (rk, lang)
    ranked = grouped_row_number(
        docs.select("doc_id", "lang", F.length("text").alias("_len")),
        ["lang"],
        [F.col("_len").asc(), F.col("doc_id").asc()],
        out="rk",
    ).select("doc_id", "lang", "rk")
    scheduled = global_row_number(
        ranked, [F.col("rk").asc(), F.col("lang").asc()], out="pos"
    ).select("lang", "pos")
    tot = scheduled.agg(F.count("*").alias("N"))
    deciled = scheduled.crossJoin(F.broadcast(tot)).select(
        "lang",
        (
            ((F.col("pos") - 1) * 10 - F.pmod((F.col("pos") - 1) * 10, F.col("N")))
            / F.col("N")
            + 1
        ).cast("int").alias("decile"),
    )
    return (
        deciled.groupBy("decile")
        .pivot("lang", ["de", "en", "es", "fr", "zh"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("decile")
    )


S_CURR_SQL = """
WITH ranked AS (
  SELECT doc_id, lang,
    ROW_NUMBER() OVER (PARTITION BY lang
      ORDER BY length(text), doc_id) AS rk
  FROM documents
),
scheduled AS (
  SELECT lang, ROW_NUMBER() OVER (ORDER BY rk, lang) AS pos
  FROM ranked
),
tot AS (SELECT COUNT(*) AS N FROM scheduled),
deciled AS (
  SELECT lang,
    CAST((pos - 1) * 10 // N + 1 AS INT) AS decile
  FROM scheduled CROSS JOIN tot
)
SELECT decile,
  CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
  CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
  CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
  CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
FROM deciled GROUP BY decile ORDER BY decile
"""


# ------------------------------------------------------------------ #
# g_degree_assortativity
# ------------------------------------------------------------------ #


def g_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the co-purchase graph
    (co-occurrence >= 3): Pearson correlation of endpoint degrees
    over directed edge endpoints."""
    li = load_table(spark, sf_dir, "lineitem")
    from idn_area_etl_spark.operators.graph import co_purchase_edges

    # r8-opt: the edge build is the staged shared co-purchase
    # subtree (see co_purchase_edges) — previously re-expanded per
    # downstream consumer
    edges = co_purchase_edges(li, min_co=3)
    deg = (
        edges.select(F.col("p1").alias("p"))
        .unionByName(edges.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count("*").alias("deg"))
    )
    d1 = deg.select(F.col("p").alias("p1"), F.col("deg").alias("dx"))
    d2 = deg.select(F.col("p").alias("p2"), F.col("deg").alias("dy"))
    # both orientations (Newman's definition is over directed stubs)
    oriented = (
        edges.join(d1, "p1")
        .join(d2, "p2")
        .select("dx", "dy")
    )
    both_dirs = oriented.unionByName(
        oriented.select(F.col("dy").alias("dx"), F.col("dx").alias("dy"))
    )
    sums = both_dirs.agg(
        F.count("*").alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        * (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    # degenerate graphs (no edges, or zero degree variance — e.g. the
    # 2-edge co>=3 graph at sf0.1) have den=0: NULL assortativity,
    # matching DuckDB's NULL-on-divide-by-zero (Spark ANSI would throw)
    return sums.select(
        (F.col("m") / 2).cast("long").alias("n_edges"),
        F.round(
            F.when(den != 0, num / den), 6
        ).alias("assortativity"),
    )


G_ASSORT_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
),
deg AS (
  SELECT p, COUNT(*) AS deg FROM (
    SELECT p1 AS p FROM edges UNION ALL SELECT p2 AS p FROM edges
  ) GROUP BY p
),
oriented AS (
  SELECT d1.deg AS dx, d2.deg AS dy
  FROM edges JOIN deg d1 ON p1 = d1.p JOIN deg d2 ON p2 = d2.p
),
both_dirs AS (
  SELECT dx, dy FROM oriented
  UNION ALL
  SELECT dy AS dx, dx AS dy FROM oriented
),
sums AS (
  SELECT COUNT(*) AS m, SUM(dx) AS sx, SUM(dy) AS sy,
    SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy, SUM(dx * dy) AS sxy
  FROM both_dirs
)
SELECT CAST(m // 2 AS BIGINT) AS n_edges,
  ROUND(CAST(m * sxy - sx * sy AS DOUBLE)
        / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
               * CAST(m * syy - sy * sy AS DOUBLE)), 6)
    AS assortativity
FROM sums
"""


SPECS = [
    QuerySpec(
        "a_regression_discontinuity",
        a_regression_discontinuity,
        A_RDD_SQL,
        doc="sharp RDD jump at the cutoff from two local-linear fits",
        tags=("experimentation", "stats"),
    ),
    QuerySpec(
        "s_curriculum_interleave",
        s_curriculum_interleave,
        S_CURR_SQL,
        doc="easiest-first curriculum, round-robin across languages",
        tags=("dataset-prep", "sampling"),
    ),
    QuerySpec(
        "g_degree_assortativity",
        g_degree_assortativity,
        G_ASSORT_SQL,
        doc="Newman degree assortativity of the co-purchase graph",
        tags=("graph", "stats"),
    ),
]
