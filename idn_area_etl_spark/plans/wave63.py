"""Sixty-third wave: fixed-effect meta-analysis, two-hop reach, and
the ABC-XYZ matrix.

Reference parity note: meta-analytic pooling + graph reach +
inventory-planning extensions; every query carries an exact DuckDB
oracle.

- **Fixed-effect meta-analysis** (`a_fixed_effect_meta`) — the
  inverse-variance pool: per nation, the BUILDING vs other-segment
  mean-balance difference with its variance (exact decimal
  moments); nations pool with weights 1/var into one fixed-effect
  estimate and its standard error.  The multi-site experiment
  readout.
- **Two-hop reach** (`g_two_hop_reach`) — for each focus part, how
  many parts are exactly two co-purchase hops away (distinct
  neighbors-of-neighbors, minus direct neighbors and self): the
  classic friends-of-friends audience-expansion count, two
  adjacency equi-joins and one distinct.
- **ABC-XYZ matrix** (`q_abc_xyz_matrix`) — inventory planning's
  workhorse: ABC class from cumulative revenue share (80/95
  breaks), XYZ class from the coefficient of variation of monthly
  ordered quantities (0.5/1.0 breaks), reported as part counts per
  (abc, xyz) cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import global_order_stats
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


# ------------------------------------------------------------------ #
# a_fixed_effect_meta
# ------------------------------------------------------------------ #


def a_fixed_effect_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-variance pooled BUILDING-vs-rest balance difference
    across nations."""
    cust = load_table(spark, sf_dir, "customer")
    grp = (F.col("c_mktsegment") == "BUILDING").cast("int")
    cells = cust.select(
        "c_nationkey", grp.alias("g"), "c_acctbal"
    ).groupBy("c_nationkey", "g").agg(
        F.count("*").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(27,6)")).alias("s"),
        F.sum(
            (F.col("c_acctbal") * F.col("c_acctbal")).cast(
                "decimal(38,10)"
            )
        ).alias("ss"),
    ).select(
        "c_nationkey",
        "g",
        "n",
        F.col("s").cast("double").alias("s"),
        F.col("ss").cast("double").alias("ss"),
    )
    wide = cells.groupBy("c_nationkey").agg(
        F.max(F.when(F.col("g") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("g") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("g") == 1, F.col("ss"))).alias("ss1"),
        F.max(F.when(F.col("g") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("g") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("g") == 0, F.col("ss"))).alias("ss0"),
    ).filter((F.col("n1") >= 2) & (F.col("n0") >= 2))
    m1 = F.col("s1") / F.col("n1")
    m0 = F.col("s0") / F.col("n0")
    v1 = (F.col("ss1") - F.col("s1") * m1) / (F.col("n1") - 1)
    v0 = (F.col("ss0") - F.col("s0") * m0) / (F.col("n0") - 1)
    var_d = v1 / F.col("n1") + v0 / F.col("n0")
    per = wide.select(
        (m1 - m0).alias("d"),
        (1.0 / var_d).alias("w"),
    ).select(
        F.col("d"),
        F.col("w"),
        (F.col("w") * F.col("d")).cast("decimal(38,12)").alias("wd"),
        F.col("w").cast("decimal(38,12)").alias("wdec"),
    )
    agg = per.agg(
        F.count("*").alias("k_sites"),
        F.sum("wd").cast("double").alias("swd"),
        F.sum("wdec").cast("double").alias("sw"),
    )
    return agg.select(
        F.col("k_sites").cast("long").alias("k_sites"),
        F.round(F.col("swd") / F.col("sw"), 6).alias("pooled_effect"),
        F.round(F.sqrt(1.0 / F.col("sw")), 6).alias("pooled_se"),
    )


A_META_SQL = """
WITH cells AS (
  SELECT c_nationkey,
    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
    COUNT(*) AS n,
    CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS s,
    CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(38,10)))
         AS DOUBLE) AS ss
  FROM customer GROUP BY 1, 2
),
wide AS (
  SELECT c_nationkey,
    MAX(CASE WHEN g = 1 THEN n END) AS n1,
    MAX(CASE WHEN g = 1 THEN s END) AS s1,
    MAX(CASE WHEN g = 1 THEN ss END) AS ss1,
    MAX(CASE WHEN g = 0 THEN n END) AS n0,
    MAX(CASE WHEN g = 0 THEN s END) AS s0,
    MAX(CASE WHEN g = 0 THEN ss END) AS ss0
  FROM cells GROUP BY c_nationkey
  HAVING MAX(CASE WHEN g = 1 THEN n END) >= 2
     AND MAX(CASE WHEN g = 0 THEN n END) >= 2
),
per AS (
  SELECT
    CAST((1.0 / ((ss1 - s1 * (s1 / n1)) / (n1 - 1) / n1
               + (ss0 - s0 * (s0 / n0)) / (n0 - 1) / n0))
      * (s1 / n1 - s0 / n0) AS DECIMAL(38,12)) AS wd,
    CAST(1.0 / ((ss1 - s1 * (s1 / n1)) / (n1 - 1) / n1
              + (ss0 - s0 * (s0 / n0)) / (n0 - 1) / n0)
      AS DECIMAL(38,12)) AS wdec
  FROM wide
)
SELECT CAST(COUNT(*) AS BIGINT) AS k_sites,
  ROUND(CAST(SUM(wd) AS DOUBLE) / CAST(SUM(wdec) AS DOUBLE), 6)
    AS pooled_effect,
  ROUND(sqrt(1.0 / CAST(SUM(wdec) AS DOUBLE)), 6) AS pooled_se
FROM per
"""


# ------------------------------------------------------------------ #
# g_two_hop_reach
# ------------------------------------------------------------------ #


def g_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct parts exactly two co-purchase hops from each focus
    parts (p < 100, co-occurrence >= 2), excluding self and
    direct neighbors."""
    li = load_table(spark, sf_dir, "lineitem")
    from idn_area_etl_spark.operators.graph import co_purchase_edges

    # r8-opt: the edge build is the staged shared co-purchase
    # subtree (see co_purchase_edges) — previously re-expanded per
    # downstream consumer
    edges = co_purchase_edges(li, min_co=2)
    adj = edges.unionByName(
        edges.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))
    )
    focus = adj.filter(F.col("p1") < 100)
    hop2 = (
        focus.alias("x")
        .join(
            adj.alias("y"),
            F.col("x.p2") == F.col("y.p1"),
        )
        .select(
            F.col("x.p1").alias("src"), F.col("y.p2").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    direct = focus.select(
        F.col("p1").alias("src"), F.col("p2").alias("dst")
    )
    pure2 = hop2.join(direct, ["src", "dst"], "left_anti")
    d1 = direct.groupBy("src").agg(F.count("*").alias("n_direct"))
    d2 = pure2.groupBy("src").agg(F.count("*").alias("n_two_hop"))
    return (
        d1.join(d2, "src", "left")
        .select(
            F.col("src").alias("part"),
            "n_direct",
            F.coalesce("n_two_hop", F.lit(0)).alias("n_two_hop"),
        )
        .orderBy("part")
    )


G_TWOHOP_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
adj AS (
  SELECT p1, p2 FROM edges
  UNION ALL
  SELECT p2 AS p1, p1 AS p2 FROM edges
),
focus AS (SELECT * FROM adj WHERE p1 < 100),
hop2 AS (
  SELECT DISTINCT x.p1 AS src, y.p2 AS dst
  FROM focus x JOIN adj y ON x.p2 = y.p1
  WHERE x.p1 <> y.p2
),
pure2 AS (
  SELECT src, dst FROM hop2
  ANTI JOIN focus ON hop2.src = focus.p1 AND hop2.dst = focus.p2
),
d1 AS (SELECT p1 AS src, COUNT(*) AS n_direct FROM focus GROUP BY 1),
d2 AS (SELECT src, COUNT(*) AS n_two_hop FROM pure2 GROUP BY 1)
SELECT d1.src AS part, CAST(n_direct AS BIGINT) AS n_direct,
  CAST(COALESCE(n_two_hop, 0) AS BIGINT) AS n_two_hop
FROM d1 LEFT JOIN d2 ON d1.src = d2.src
ORDER BY part
"""


# ------------------------------------------------------------------ #
# q_abc_xyz_matrix
# ------------------------------------------------------------------ #


def q_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (cumulative revenue share) x XYZ (monthly-quantity CV)
    part classification matrix."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(27,2)")).alias(
            "rev"
        )
    )
    # unbounded part cardinality — distributed range-partitioned
    # cumulative share (one range shuffle, no single-partition window)
    ranked = global_order_stats(
        rev,
        [F.col("rev").desc(), F.col("l_partkey").asc()],
        F.col("rev"),
        run_out="cum_rev",
        total_out="grand",
    ).select(
        "l_partkey",
        (
            F.col("cum_rev").cast("double")
            / F.col("grand").cast("double")
        ).alias("cum_share"),
    )
    abc = ranked.select(
        "l_partkey",
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    monthly = li.groupBy(
        "l_partkey", F.trunc("l_shipdate", "month").alias("m")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(27,2)")).alias("q"))
    cv = monthly.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.sum(F.col("q").cast("decimal(27,2)")).alias("sq"),
        F.sum(
            (F.col("q") * F.col("q")).cast("decimal(38,6)")
        ).alias("sqq"),
    ).select(
        "l_partkey",
        (
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    F.col("sqq").cast("double") / F.col("n")
                    - (F.col("sq").cast("double") / F.col("n"))
                    * (F.col("sq").cast("double") / F.col("n")),
                )
            )
            / (F.col("sq").cast("double") / F.col("n"))
        ).alias("cv"),
    )
    xyz = cv.select(
        "l_partkey",
        F.when(F.col("cv") <= 0.5, "X")
        .when(F.col("cv") <= 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc", "xyz")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("abc", "xyz")
    )


Q_ABCXYZ_SQL = """
WITH rev AS (
  SELECT l_partkey,
    SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS rev
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(rev) AS grand FROM rev),
ranked AS (
  SELECT l_partkey,
    CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      / CAST(grand AS DOUBLE) AS cum_share
  FROM rev CROSS JOIN tot
),
abc AS (
  SELECT l_partkey,
    CASE WHEN cum_share <= 0.80 THEN 'A'
         WHEN cum_share <= 0.95 THEN 'B'
         ELSE 'C' END AS abc
  FROM ranked
),
monthly AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
    SUM(CAST(l_quantity AS DECIMAL(27,2))) AS q
  FROM lineitem GROUP BY 1, 2
),
cv AS (
  SELECT l_partkey,
    sqrt(GREATEST(0.0,
      CAST(SUM(CAST(q * q AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
      - (CAST(SUM(CAST(q AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*))
        * (CAST(SUM(CAST(q AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*))))
      / (CAST(SUM(CAST(q AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*))
      AS cv
  FROM monthly GROUP BY l_partkey
),
xyz AS (
  SELECT l_partkey,
    CASE WHEN cv <= 0.5 THEN 'X'
         WHEN cv <= 1.0 THEN 'Y'
         ELSE 'Z' END AS xyz
  FROM cv
)
SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM abc JOIN xyz USING (l_partkey)
GROUP BY abc, xyz ORDER BY abc, xyz
"""


SPECS = [
    QuerySpec(
        "a_fixed_effect_meta",
        a_fixed_effect_meta,
        A_META_SQL,
        doc="inverse-variance pooled segment effect across nations",
        tags=("stats", "experimentation"),
    ),
    QuerySpec(
        "g_two_hop_reach",
        g_two_hop_reach,
        G_TWOHOP_SQL,
        doc="distinct two-hop co-purchase reach per focus part",
        tags=("graph",),
    ),
    QuerySpec(
        "q_abc_xyz_matrix",
        q_abc_xyz_matrix,
        Q_ABCXYZ_SQL,
        doc="ABC revenue x XYZ variability part classification matrix",
        tags=("bi", "inventory"),
    ),
]
