"""Nineteenth wave: time-weighted aggregates, conditional resets,
period-over-period deltas.

- **TWAP** — time-weighted average, the correct mean for irregularly
  sampled series (plain AVG over-weights bursts).  Interval weights
  are exact integer microseconds from lead(); products stay per-row
  doubles; sums go through decimal → the final division is one
  double op on both engines.
- **Running balance with resets** — cumulative sums that restart at a
  condition ('signup' events): the gaps-and-islands segment trick
  (cumsum of reset flags → segment id) turns "stateful reset logic"
  into two stacked windows over ONE (user) partitioning — no UDF, no
  iteration.
- **Month-over-month deltas** — lag() over the pre-aggregated monthly
  series; the workhorse of reporting pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


def q_twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of event value.

    Each value holds until the user's next event (last event carries
    no interval).  Users with a single event are excluded (zero
    total weight).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = (
        F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    ).alias("dt_us")
    seg = ev.select("user_id", "value", dt).filter(F.col("dt_us").isNotNull())
    agg = seg.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum("dt_us").alias("total_us"),
        F.sum(
            (F.col("value") * F.col("dt_us").cast("double")).cast(
                "decimal(30,6)"
            )
        ).alias("wsum"),
    )
    return (
        agg.filter(F.col("total_us") > 0)
        .select(
            "user_id",
            "n_intervals",
            "total_us",
            F.round(
                F.col("wsum").cast("double")
                / F.col("total_us").cast("double"),
                6,
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


Q_TWAP_SQL = """
WITH seg AS (
  SELECT user_id, value,
    epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      - epoch_us(ts) AS dt_us
  FROM events
),
agg AS (
  SELECT user_id,
    CAST(COUNT(*) AS BIGINT) AS n_intervals,
    CAST(SUM(dt_us) AS BIGINT) AS total_us,
    SUM(CAST(value * CAST(dt_us AS DOUBLE) AS DECIMAL(30,6))) AS wsum
  FROM seg WHERE dt_us IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_intervals, total_us,
  ROUND(CAST(wsum AS DOUBLE) / CAST(total_us AS DOUBLE), 6) AS twap
FROM agg WHERE total_us > 0
ORDER BY user_id
"""


def q_running_balance_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running value balance that RESETS at every 'signup'.

    Segment id = cumulative count of signup events (gaps-and-islands);
    the balance is a second cumulative window inside (user, segment).
    Output = each segment's final balance.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.withColumn(
        "segment",
        F.sum((F.col("event_type") == "signup").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    out = seg.groupBy("user_id", "segment").agg(
        F.min("ts").alias("segment_start"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(24,6)"))
        .cast("double")
        .alias("balance"),
    )
    return out.orderBy("user_id", "segment")


Q_RUNNING_RESET_SQL = """
WITH seg AS (
  SELECT user_id, ts, value,
    SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS segment
  FROM events
)
SELECT user_id, CAST(segment AS BIGINT) AS segment,
  MIN(ts) AS segment_start,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS balance
FROM seg
GROUP BY user_id, segment
ORDER BY user_id, segment
"""


def q_mom_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue deltas: absolute and percent."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(24,6)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - prev, 6).alias("mom_abs"),
        F.round((F.col("revenue") - prev) / prev * 100.0, 6).alias("mom_pct"),
    ).orderBy("month")


Q_MOM_SQL = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT month, revenue,
  ROUND(revenue - LAG(revenue) OVER (ORDER BY month), 6) AS mom_abs,
  ROUND((revenue - LAG(revenue) OVER (ORDER BY month))
        / LAG(revenue) OVER (ORDER BY month) * 100.0, 6) AS mom_pct
FROM monthly ORDER BY month
"""


SPECS = [
    QuerySpec("q_twap_user_value", q_twap_user_value, Q_TWAP_SQL,
              doc="time-weighted average over irregular event series",
              tags=("events", "stats")),
    QuerySpec("q_running_balance_resets", q_running_balance_resets,
              Q_RUNNING_RESET_SQL,
              doc="cumulative balance with conditional resets (gaps-and-islands)",
              tags=("window", "events")),
    QuerySpec("q_mom_revenue_change", q_mom_revenue_change, Q_MOM_SQL,
              doc="month-over-month absolute and percent deltas",
              tags=("window",)),
]
