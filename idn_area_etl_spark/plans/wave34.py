"""Thirty-fourth wave: financial reconciliation, ABC classification,
and trailing-window modes.

Reference parity note: engine-native analytics; every query carries
an exact DuckDB oracle.

- **Order reconciliation** (`q_order_reconciliation`) — the
  double-entry check: per order, the lineitem-derived gross
  (Σ extendedprice·(1+tax)·(1−discount), exact decimal) against the
  order header's totalprice, bucketed by relative difference.  At
  100 TB this is the standard cross-table consistency audit: one
  equi-join of two rollups, decimal arithmetic end-to-end until the
  final ratio.
- **ABC classification** (`q_abc_classification`) — inventory ABC:
  parts ranked by revenue, class A covers the first 70% of
  cumulative revenue, B to 90%, C the tail.  The cumulative window
  runs over the part rollup (not the fact table); exact decimal
  shares; per-class part counts and revenue.
- **Trailing-window mode** (`w_trailing_mode`) — for each day, the
  modal event type over the trailing 7 days: per-(day, type) counts
  once, then a RANGE-frame window per type over the day axis, then
  a deterministic per-day argmax (count desc, type asc).  The
  pattern for "rolling most-frequent" without recounting raw events
  per window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import global_order_stats
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table

# ------------------------------------------------------------------ #
# q_order_reconciliation
# ------------------------------------------------------------------ #

RECON_TOL = 0.05  # within 5% of the header → 'reconciled'


def q_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem-derived gross vs order header totalprice, bucketed by
    relative difference."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    gross = (
        F.col("l_extendedprice")
        * (1 + F.col("l_tax"))
        * (1 - F.col("l_discount"))
    )
    li_sum = li.groupBy("l_orderkey").agg(
        F.sum(gross.cast("decimal(24,6)")).alias("li_gross")
    )
    joined = o.select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(24,6)").alias("hdr")
    ).join(li_sum, o.o_orderkey == li_sum.l_orderkey, "left")
    rel_diff = F.abs(
        F.col("li_gross").cast("double") - F.col("hdr").cast("double")
    ) / F.col("hdr").cast("double")
    status = (
        F.when(F.col("li_gross").isNull(), F.lit("no_lines"))
        .when(rel_diff <= RECON_TOL, F.lit("reconciled"))
        .otherwise(F.lit("mismatch"))
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("status")
    )


Q_RECON_SQL = f"""
WITH li_sum AS (
  SELECT l_orderkey,
    SUM(CAST(l_extendedprice * (1 + l_tax) * (1 - l_discount)
             AS DECIMAL(24,6))) AS li_gross
  FROM lineitem GROUP BY 1
),
joined AS (
  SELECT CAST(o.o_totalprice AS DECIMAL(24,6)) AS hdr, s.li_gross
  FROM orders o LEFT JOIN li_sum s ON o.o_orderkey = s.l_orderkey
)
SELECT CASE
    WHEN li_gross IS NULL THEN 'no_lines'
    WHEN ABS(CAST(li_gross AS DOUBLE) - CAST(hdr AS DOUBLE))
         / CAST(hdr AS DOUBLE) <= {RECON_TOL} THEN 'reconciled'
    ELSE 'mismatch' END AS status,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM joined GROUP BY 1 ORDER BY status
"""


# ------------------------------------------------------------------ #
# q_abc_classification
# ------------------------------------------------------------------ #

ABC_A, ABC_B = 0.7, 0.9


def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC part classification by cumulative revenue share."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(
        F.sum(rev.cast("decimal(24,6)")).alias("rev")
    )
    # per-part cardinality is unbounded at scale — cumulative share via
    # the distributed range-partitioned primitive (one range shuffle,
    # no single-partition window)
    shared = global_order_stats(
        per_part,
        [F.col("rev").desc(), F.col("l_partkey").asc()],
        F.col("rev"),
        run_out="cum_rev",
        total_out="total_rev",
    ).select(
        "l_partkey",
        "rev",
        (
            F.col("cum_rev").cast("double")
            / F.col("total_rev").cast("double")
        ).alias("cum_share"),
    )
    cls = (
        F.when(F.col("cum_share") <= ABC_A, F.lit("A"))
        .when(F.col("cum_share") <= ABC_B, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        shared.select(cls.alias("abc_class"), "rev")
        .groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("rev").cast("double").alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


Q_ABC_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)))
      AS rev
  FROM lineitem GROUP BY 1
),
shared AS (
  SELECT l_partkey, rev,
    CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      / CAST(SUM(rev) OVER () AS DOUBLE) AS cum_share
  FROM per_part
)
SELECT CASE WHEN cum_share <= {ABC_A} THEN 'A'
            WHEN cum_share <= {ABC_B} THEN 'B'
            ELSE 'C' END AS abc_class,
  CAST(COUNT(*) AS BIGINT) AS n_parts,
  CAST(SUM(rev) AS DOUBLE) AS class_revenue
FROM shared GROUP BY 1 ORDER BY abc_class
"""


# ------------------------------------------------------------------ #
# w_trailing_mode
# ------------------------------------------------------------------ #

MODE_WINDOW_DAYS = 7


def w_trailing_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: the modal event type over the trailing 7 days
    (among types active that day — inactive types carry no row on the
    day axis, identical semantics on both engines)."""
    ev = load_table(spark, sf_dir, "events")
    day_counts = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    day_num = F.datediff("day", F.lit("2020-01-01"))
    w_trail = (
        Window.partitionBy("event_type")
        .orderBy(day_num)
        .rangeBetween(-(MODE_WINDOW_DAYS - 1), 0)
    )
    trailing = day_counts.select(
        "day",
        "event_type",
        F.sum("cnt").over(w_trail).cast("long").alias("trail_cnt"),
    )
    w_rank = Window.partitionBy("day").orderBy(
        F.col("trail_cnt").desc(), "event_type"
    )
    return (
        trailing.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "day",
            F.col("event_type").alias("mode_type"),
            "trail_cnt",
        )
        .orderBy("day")
    )


W_TRAILMODE_SQL = f"""
WITH day_counts AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
trail_counts AS (
  SELECT day, event_type,
    CAST(SUM(cnt) OVER (PARTITION BY event_type
      ORDER BY date_diff('day', DATE '2020-01-01', day)
      RANGE BETWEEN {MODE_WINDOW_DAYS - 1} PRECEDING AND CURRENT ROW)
      AS BIGINT) AS trail_cnt
  FROM day_counts
)
SELECT day, event_type AS mode_type, trail_cnt
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY day
    ORDER BY trail_cnt DESC, event_type) AS rn
  FROM trail_counts
) WHERE rn = 1
ORDER BY day
"""


SPECS = [
    QuerySpec(
        "q_order_reconciliation",
        q_order_reconciliation,
        Q_RECON_SQL,
        doc="lineitem gross vs order header, bucketed consistency audit",
        tags=("quality", "join"),
    ),
    QuerySpec(
        "q_abc_classification",
        q_abc_classification,
        Q_ABC_SQL,
        doc="ABC part classes by cumulative revenue share",
        tags=("analytics", "distribution"),
    ),
    QuerySpec(
        "w_trailing_mode",
        w_trailing_mode,
        W_TRAILMODE_SQL,
        doc="per-day modal event type over a trailing 7-day window",
        tags=("window", "events"),
    ),
]
