"""Seventy-sixth wave: repeat purchase, internal consistency, and
the Oaxaca-Blinder decomposition.

Reference parity note: loyalty metrics + psychometrics + econometric
gap decomposition; every query carries an exact DuckDB oracle.

- **Repeat purchase** (`q_repeat_purchase_rate`) — per focus part
  (< 30): customers who bought it in 2+ distinct orders over
  customers who bought it at all — the part-level loyalty signal
  behind replenishment forecasting.
- **Cronbach alpha** (`a_cronbach_alpha`) — internal consistency of
  the first 5 embedding dimensions treated as items of a scale:
  alpha = k/(k-1) (1 - sum(item variances)/variance(total score)).
  Exact decimal moments throughout.
- **Oaxaca-Blinder** (`a_oaxaca_decomposition`) — the wage-gap
  workhorse re-aimed at spend: the BUILDING vs rest gap in mean
  customer spend decomposed into the part explained by different
  order counts (endowments, at the comparison group's slope) and
  the unexplained part (coefficients + interaction).  Per-group
  OLS from decimal moments; identity gap = explained + unexplained
  pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


# ------------------------------------------------------------------ #
# q_repeat_purchase_rate
# ------------------------------------------------------------------ #


def q_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate per focus part (< 30)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust_part = (
        li.filter(F.col("l_partkey") < 30)
        .join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select("l_partkey", "o_custkey", "l_orderkey")
        .distinct()
        .groupBy("l_partkey", "o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        cust_part.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_buyers"),
            F.sum((F.col("n_orders") >= 2).cast("long")).alias(
                "n_repeat"
            ),
        )
        .select(
            F.col("l_partkey").alias("part"),
            "n_buyers",
            "n_repeat",
            F.round(
                F.col("n_repeat").cast("double") / F.col("n_buyers"), 6
            ).alias("repeat_rate"),
        )
        .orderBy("part")
    )


Q_REPEAT_SQL = """
WITH cust_part AS (
  SELECT l_partkey, o_custkey, COUNT(*) AS n_orders
  FROM (
    SELECT DISTINCT l_partkey, o_custkey, l_orderkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_partkey < 30
  )
  GROUP BY l_partkey, o_custkey
)
SELECT l_partkey AS part, CAST(COUNT(*) AS BIGINT) AS n_buyers,
  CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_repeat,
  ROUND(CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 6) AS repeat_rate
FROM cust_part GROUP BY l_partkey ORDER BY part
"""


# ------------------------------------------------------------------ #
# a_cronbach_alpha
# ------------------------------------------------------------------ #

_K_ITEMS = 5


def a_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach alpha over the first 5 embedding dims as items."""
    emb = load_table(spark, sf_dir, "embeddings")
    items = emb.select(
        *[
            F.get(F.col("embedding"), i).cast("double").alias(f"x{i}")
            for i in range(_K_ITEMS)
        ]
    ).select(
        *[F.col(f"x{i}") for i in range(_K_ITEMS)],
        sum(F.col(f"x{i}") for i in range(_K_ITEMS)).alias("total"),
    )
    aggs = [F.count("*").alias("n")]
    for i in range(_K_ITEMS):
        aggs.append(
            F.sum(F.col(f"x{i}").cast("decimal(27,10)")).alias(f"s{i}")
        )
        aggs.append(
            F.sum(
                (F.col(f"x{i}") * F.col(f"x{i}")).cast("decimal(38,12)")
            ).alias(f"ss{i}")
        )
    aggs.append(F.sum(F.col("total").cast("decimal(27,10)")).alias("st"))
    aggs.append(
        F.sum(
            (F.col("total") * F.col("total")).cast("decimal(38,12)")
        ).alias("sst")
    )
    m = items.agg(*aggs)

    def var(s, ss):
        mu = F.col(s).cast("double") / F.col("n")
        return (
            F.col(ss).cast("double") - F.col(s).cast("double") * mu
        ) / (F.col("n") - 1)

    item_var_sum = None
    for i in range(_K_ITEMS):
        v = var(f"s{i}", f"ss{i}")
        item_var_sum = v if item_var_sum is None else item_var_sum + v
    tot_var = var("st", "sst")
    k = float(_K_ITEMS)
    alpha = (k / (k - 1.0)) * (1.0 - item_var_sum / tot_var)
    return m.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round(item_var_sum, 6).alias("sum_item_var"),
        F.round(tot_var, 6).alias("total_var"),
        F.round(alpha, 6).alias("cronbach_alpha"),
    )


def _alpha_sql() -> str:
    item_vars = []
    sums = []
    for i in range(_K_ITEMS):
        x = f"CAST(embedding[{i + 1}] AS DOUBLE)"
        sums.append(
            f"SUM(CAST({x} AS DECIMAL(27,10))) AS s{i},"
            f" SUM(CAST({x} * {x} AS DECIMAL(38,12))) AS ss{i}"
        )
        item_vars.append(
            f"(CAST(ss{i} AS DOUBLE) - CAST(s{i} AS DOUBLE)"
            f" * (CAST(s{i} AS DOUBLE) / n)) / (n - 1)"
        )
    total = " + ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE)" for i in range(_K_ITEMS)
    )
    ivs = " + ".join(item_vars)
    k = float(_K_ITEMS)
    return f"""
WITH m AS (
  SELECT COUNT(*) AS n,
    {', '.join(sums)},
    SUM(CAST(({total}) AS DECIMAL(27,10))) AS st,
    SUM(CAST(({total}) * ({total}) AS DECIMAL(38,12))) AS sst
  FROM embeddings
)
SELECT CAST(n AS BIGINT) AS n_rows,
  ROUND({ivs}, 6) AS sum_item_var,
  ROUND((CAST(sst AS DOUBLE) - CAST(st AS DOUBLE)
      * (CAST(st AS DOUBLE) / n)) / (n - 1), 6) AS total_var,
  ROUND(({k!r} / ({k!r} - 1.0)) * (1.0 - ({ivs})
      / ((CAST(sst AS DOUBLE) - CAST(st AS DOUBLE)
          * (CAST(st AS DOUBLE) / n)) / (n - 1))), 6)
    AS cronbach_alpha
FROM m
"""


# ------------------------------------------------------------------ #
# a_oaxaca_decomposition
# ------------------------------------------------------------------ #


def a_oaxaca_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oaxaca-Blinder: BUILDING-vs-rest gap in mean spend decomposed
    at the comparison (rest) group's slope."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("x"),
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).alias("yv"),
    )
    base = cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "inner"
    ).select(
        (F.col("c_mktsegment") == "BUILDING").cast("int").alias("g"),
        F.col("x").cast("double").alias("x"),
        F.col("yv").cast("double").alias("y"),
    )
    m = base.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(27,6)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(27,2)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,8)")).alias(
            "sxx"
        ),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,8)")).alias(
            "sxy"
        ),
    ).select(
        "g",
        "n",
        F.col("sx").cast("double").alias("sx"),
        F.col("sy").cast("double").alias("sy"),
        F.col("sxx").cast("double").alias("sxx"),
        F.col("sxy").cast("double").alias("sxy"),
    )

    def grab(g, col):
        return F.max(F.when(F.col("g") == g, F.col(col)))

    wide = m.agg(
        *[
            grab(g, c).alias(f"{c}{g}")
            for g in (0, 1)
            for c in ("n", "sx", "sy", "sxx", "sxy")
        ]
    )

    def beta(g):
        return (
            F.col(f"sxy{g}")
            - F.col(f"sx{g}") * F.col(f"sy{g}") / F.col(f"n{g}")
        ) / (
            F.col(f"sxx{g}")
            - F.col(f"sx{g}") * F.col(f"sx{g}") / F.col(f"n{g}")
        )

    def xbar(g):
        return F.col(f"sx{g}") / F.col(f"n{g}")

    def ybar(g):
        return F.col(f"sy{g}") / F.col(f"n{g}")

    gap = ybar(1) - ybar(0)
    explained = (xbar(1) - xbar(0)) * beta(0)
    return wide.select(
        F.round(gap, 6).alias("mean_gap"),
        F.round(explained, 6).alias("explained_endowments"),
        F.round(gap - explained, 6).alias("unexplained"),
        F.round(beta(0), 6).alias("beta_rest"),
        F.round(beta(1), 6).alias("beta_building"),
    )


A_OAXACA_SQL = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS x,
    SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS yv
  FROM orders GROUP BY o_custkey
),
base AS (
  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
    CAST(x AS DOUBLE) AS x, CAST(yv AS DOUBLE) AS y
  FROM customer JOIN per_cust ON c_custkey = o_custkey
),
m AS (
  SELECT g, COUNT(*) AS n,
    CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(y AS DECIMAL(27,2))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS sxy
  FROM base GROUP BY g
),
wide AS (
  SELECT
    MAX(CASE WHEN g = 0 THEN n END) AS n0,
    MAX(CASE WHEN g = 0 THEN sx END) AS sx0,
    MAX(CASE WHEN g = 0 THEN sy END) AS sy0,
    MAX(CASE WHEN g = 0 THEN sxx END) AS sxx0,
    MAX(CASE WHEN g = 0 THEN sxy END) AS sxy0,
    MAX(CASE WHEN g = 1 THEN n END) AS n1,
    MAX(CASE WHEN g = 1 THEN sx END) AS sx1,
    MAX(CASE WHEN g = 1 THEN sy END) AS sy1,
    MAX(CASE WHEN g = 1 THEN sxx END) AS sxx1,
    MAX(CASE WHEN g = 1 THEN sxy END) AS sxy1
  FROM m
)
SELECT
  ROUND(sy1 / n1 - sy0 / n0, 6) AS mean_gap,
  ROUND((sx1 / n1 - sx0 / n0)
    * ((sxy0 - sx0 * sy0 / n0) / (sxx0 - sx0 * sx0 / n0)), 6)
    AS explained_endowments,
  ROUND((sy1 / n1 - sy0 / n0) - (sx1 / n1 - sx0 / n0)
    * ((sxy0 - sx0 * sy0 / n0) / (sxx0 - sx0 * sx0 / n0)), 6)
    AS unexplained,
  ROUND((sxy0 - sx0 * sy0 / n0) / (sxx0 - sx0 * sx0 / n0), 6)
    AS beta_rest,
  ROUND((sxy1 - sx1 * sy1 / n1) / (sxx1 - sx1 * sx1 / n1), 6)
    AS beta_building
FROM wide
"""


SPECS = [
    QuerySpec(
        "q_repeat_purchase_rate",
        q_repeat_purchase_rate,
        Q_REPEAT_SQL,
        doc="repeat-purchase rate per focus part",
        tags=("bi", "loyalty"),
    ),
    QuerySpec(
        "a_cronbach_alpha",
        a_cronbach_alpha,
        _alpha_sql(),
        doc="Cronbach alpha over 5 embedding dims as scale items",
        tags=("stats",),
    ),
    QuerySpec(
        "a_oaxaca_decomposition",
        a_oaxaca_decomposition,
        A_OAXACA_SQL,
        doc="Oaxaca-Blinder spend-gap decomposition at rest-group slope",
        tags=("stats", "economics"),
    ),
]
