"""General analytical query surface over the TPC-H-ish tables.

The reference has no joins/aggregations/windows (SURVEY.md §2.3-2.7
list them as absent); these are the engine-native Spark capabilities a
user of the combined engine gets, expressed declaratively so Catalyst
handles pushdown, join strategy (broadcast for dims), and AQE.

Scale notes per query are in the builder docstrings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import grouped_topk
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


def dsum(col: Column, alias: str) -> Column:
    """Order-independent exact sum of a double expression (see
    registry.py determinism rules)."""
    return F.sum(col.cast("decimal(24,6)")).cast("double").alias(alias)


def fp_dsum(col: Column, alias: str, scale: int = 1_000_000) -> Column:
    """Fixed-point twin of :func:`dsum` for MONEY-TYPED expressions:
    non-negative doubles whose true value has at most
    ``log10(scale)`` decimal places (TPC-H quantities are integral;
    prices/discounts/taxes have 2 dp, so their 2- and 3-factor
    products have <= 6).

    ``(x*scale + 0.5).cast(long)`` is round-half-up without touching
    ``BigDecimal`` (Spark's double->decimal cast goes through
    ``BigDecimal.valueOf`` = ``Double.toString`` per row — measured
    2.6x slower on TPC-H Q1); per-row products stay ~1e11 << 2^53 so
    the double arithmetic is exact, and the ``decimal(38,0)`` sum is
    compact-long-backed and overflow-safe at any corpus size.
    Value-identical to :func:`dsum` on these inputs (pinned by the
    unchanged DuckDB oracles)."""
    micros = ((col * scale) + F.lit(0.5)).cast("long")
    return (
        (F.sum(micros.cast("decimal(38,0)")) / scale)
        .cast("double")
        .alias(alias)
    )


def _revenue() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# q1 — pricing summary (TPC-H Q1 shape): full lineitem scan, 2-key
# hash agg with 8 aggregates.  Scale: map-side partial agg + tiny key
# space → shuffle is O(keys), not O(rows).
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02"))
    )
    charge = _revenue() * (1 + F.col("l_tax"))

    # fixed-point sums (see fp_dsum): all inputs are money-typed
    def fps(col: Column) -> Column:
        return (
            F.sum(((col * 1_000_000) + F.lit(0.5)).cast("long").cast("decimal(38,0)"))
            / 1_000_000
        ).cast("double")

    qty_sum = fps(F.col("l_quantity"))
    price_sum = fps(F.col("l_extendedprice"))
    disc_sum = fps(F.col("l_discount"))
    n = F.count("*")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            qty_sum.alias("sum_qty"),
            price_sum.alias("sum_base_price"),
            fp_dsum(_revenue(), "sum_disc_price"),
            fp_dsum(charge, "sum_charge"),
            (qty_sum / n).alias("avg_qty"),
            (price_sum / n).alias("avg_price"),
            (disc_sum / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
    AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q3 — shipping priority: 3-way join + agg + top-k.  Scale: customer
# filter first (pushdown), lineitem is the big side; orders/customer
# join goes broadcast at this SF and shuffle-hash at scale via AQE.
# --------------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.to_timestamp(F.lit("1998-06-01"))
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fp_dsum(_revenue(), "revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
    AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# q5 — regional supplier revenue: 6-way star join.  Scale: region/
# nation/supplier/customer broadcast; only orders⋈lineitem shuffles.
# --------------------------------------------------------------------------


def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(fp_dsum(_revenue(), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
    AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------------
# q6 — forecast revenue: pure scan+filter+scalar agg.  Scale: filters
# push to parquet (check PushedFilters in explain), no shuffle at all
# beyond the final single-row agg.
# --------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        fp_dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count("*").alias("n_items"),
    )


Q6_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(24,6))) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.02 AND l_discount <= 0.06
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q10 — returned items: join + agg + top-k customers by lost revenue.
# --------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(fp_dsum(_revenue(), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
    AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# window: top-3 customers by account balance per nation.
# --------------------------------------------------------------------------


def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale (r7, window-funnel gate): the per-nation top-3 uses
    ``ranks.grouped_topk`` — n_name has a 25-value domain, so a plain
    per-nation window would stream 1/25th of the customer table
    (data-scaled) through one task."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    )
    return (
        grouped_topk(
            joined,
            ["n_name"],
            [F.desc("c_acctbal"), F.col("c_custkey")],
            3,
            salt_key=F.col("c_custkey"),
            out="rank_in_nation",
        )
        .select("n_name", "rank_in_nation", "c_custkey", "c_name", "c_acctbal")
        .orderBy("n_name", "rank_in_nation")
    )


Q_TOP_CUST_SQL = """
SELECT n_name, CAST(rank_in_nation AS INT) AS rank_in_nation,
       c_custkey, c_name, c_acctbal
FROM (
  SELECT n_name, c_custkey, c_name, c_acctbal,
    ROW_NUMBER() OVER (PARTITION BY n_name
                       ORDER BY c_acctbal DESC, c_custkey) AS rank_in_nation
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
WHERE rank_in_nation <= 3
ORDER BY n_name, rank_in_nation
"""


# --------------------------------------------------------------------------
# anti join: customers that never ordered.
# --------------------------------------------------------------------------


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers inactive in the final 18 months of data."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


Q_NO_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# semi join: orders having a late lineitem (Q4 shape).
# --------------------------------------------------------------------------


def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS")
    ).select("l_orderkey").distinct()
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


Q_LATE_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 120 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# rollup: revenue by region/nation with subtotals + grand total.
# --------------------------------------------------------------------------


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(24,6)"))
            .cast("double")
            .alias("total_price"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("r_name", "n_name")
    )


Q_ROLLUP_SQL = """
SELECT r_name, n_name,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS total_price,
  COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name, n_name
"""


# --------------------------------------------------------------------------
# conditional-agg pivot: big vs small part prices per brand.
# --------------------------------------------------------------------------


def q_part_brand_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    small = F.when(F.col("p_size") < 25, F.col("p_retailprice"))
    big = F.when(F.col("p_size") >= 25, F.col("p_retailprice"))
    return (
        part.groupBy("p_brand")
        .agg(
            F.sum(small.cast("decimal(24,6)")).cast("double").alias("small_price"),
            F.sum(big.cast("decimal(24,6)")).cast("double").alias("big_price"),
            F.count(small).alias("n_small"),
            F.count(big).alias("n_big"),
        )
        .orderBy("p_brand")
    )


Q_PIVOT_SQL = """
SELECT p_brand,
  CAST(SUM(CAST(CASE WHEN p_size < 25 THEN p_retailprice END
    AS DECIMAL(24,6))) AS DOUBLE) AS small_price,
  CAST(SUM(CAST(CASE WHEN p_size >= 25 THEN p_retailprice END
    AS DECIMAL(24,6))) AS DOUBLE) AS big_price,
  COUNT(CASE WHEN p_size < 25 THEN 1 END) AS n_small,
  COUNT(CASE WHEN p_size >= 25 THEN 1 END) AS n_big
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


# --------------------------------------------------------------------------
# distinct aggregation + set op: segment overlap of big spenders.
# --------------------------------------------------------------------------


def q_segment_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


Q_SEG_DISTINCT_SQL = """
SELECT c_mktsegment,
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(DISTINCT o_orderkey) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT surface: customers active in both halves of the
    date range, minus the AUTOMOBILE segment."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    mid = F.to_timestamp(F.lit("1998-01-01"))
    early = orders.filter(F.col("o_orderdate") < mid).select(
        F.col("o_custkey").alias("c_custkey")
    )
    late = orders.filter(F.col("o_orderdate") >= mid).select(
        F.col("o_custkey").alias("c_custkey")
    )
    auto = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    return (
        early.intersect(late).exceptAll(auto.distinct()).orderBy("c_custkey")
    )


Q_SET_OPS_SQL = """
SELECT c_custkey FROM (
  SELECT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  INTERSECT
  SELECT o_custkey AS c_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
)
EXCEPT ALL
SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
ORDER BY c_custkey
"""


SPECS = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_SQL, headline=True,
              doc="TPC-H Q1 shape: scan + 2-key hash agg, 8 aggregates",
              tags=("agg",)),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_SQL, headline=True,
              doc="3-way join + agg + deterministic top-k", tags=("join",)),
    QuerySpec("q5_regional_revenue", q5_regional_revenue, Q5_SQL, headline=True,
              doc="6-way star join with broadcast dims", tags=("join",)),
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL,
              doc="scan+filter+scalar agg; parquet pushdown", tags=("scan",)),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL, headline=True,
              doc="join + agg + top-20", tags=("join",)),
    QuerySpec("q_top_customers_per_nation", q_top_customers_per_nation,
              Q_TOP_CUST_SQL, doc="row_number window top-3 per group",
              tags=("window",)),
    QuerySpec("q_customers_without_orders", q_customers_without_orders,
              Q_NO_ORDERS_SQL, doc="left_anti join (NOT EXISTS)",
              tags=("join",)),
    QuerySpec("q_late_order_priority", q_late_order_priority, Q_LATE_SQL,
              doc="left_semi join (EXISTS) + agg", tags=("join",)),
    QuerySpec("q_rollup_revenue", q_rollup_revenue, Q_ROLLUP_SQL,
              doc="ROLLUP with subtotals", tags=("agg",)),
    QuerySpec("q_part_brand_pivot", q_part_brand_pivot, Q_PIVOT_SQL,
              doc="conditional-aggregation pivot", tags=("agg",)),
    QuerySpec("q_segment_distinct", q_segment_distinct, Q_SEG_DISTINCT_SQL,
              doc="multi count-distinct", tags=("agg",)),
    QuerySpec("q_set_ops", q_set_ops, Q_SET_OPS_SQL,
              doc="INTERSECT + EXCEPT ALL", tags=("setop",)),
]
