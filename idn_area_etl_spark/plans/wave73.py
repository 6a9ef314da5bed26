"""Seventy-third wave: inter-arrival burstiness, catalog growth, and
churn-risk flags.

Reference parity note: temporal-pattern + assortment + lifecycle
analytics; every query carries an exact DuckDB oracle.

- **Inter-arrival burstiness** (`d_interarrival_burstiness`) — the
  Goh-Barabasi burstiness parameter B = (sigma - mu)/(sigma + mu)
  of each user's inter-event times, rolled up per event-count
  decile: B -> -1 periodic, 0 Poisson, +1 bursty.  Complements the
  wave-51 Fano factor (counts) with the waiting-time view.
- **Catalog growth** (`q_catalog_growth`) — assortment expansion:
  parts first sold per month and the cumulative catalog curve
  (first-seen month reduce + running sum; no month-over-month
  distinct scans).
- **Churn risk** (`q_churn_risk_flags`) — the lifecycle alarm: users
  whose gap since their LAST event exceeds 3x their own median
  inter-event gap (percentile_disc — exact value selection);
  reports flagged counts per activity quartile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import global_ntile
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


# ------------------------------------------------------------------ #
# d_interarrival_burstiness
# ------------------------------------------------------------------ #


def d_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mean Goh-Barabasi burstiness per user-activity quartile."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(w))
            ).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    per_user = gaps.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("g").alias("sg"),
        F.sum(
            (F.col("g").cast("double") * F.col("g")).cast(
                "decimal(38,4)"
            )
        ).alias("sgg"),
    ).filter(F.col("n") >= 2)
    mu = F.col("sg").cast("double") / F.col("n")
    var = (
        F.col("sgg").cast("double") - F.col("sg").cast("double") * mu
    ) / F.col("n")
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    scored = per_user.select(
        "n",
        ((sd - mu) / (sd + mu)).alias("b"),
    )
    # per-user quartiles are unbounded at scale: distributed ntile
    quart = global_ntile(
        scored, [F.col("n").asc(), F.col("b").asc()], 4, out="quartile"
    ).select("b", "quartile")
    return (
        quart.groupBy("quartile")
        .agg(
            F.count("*").alias("n_users"),
            F.round(
                (
                    F.sum(F.col("b").cast("decimal(20,12)"))
                    / F.count("*")
                ).cast("double"),
                6,
            ).alias("mean_burstiness"),
        )
        .orderBy("quartile")
    )


D_BURSTY_SQL = """
WITH gaps AS (
  SELECT user_id,
    epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
      ORDER BY ts, event_id)) AS g
  FROM events
),
per_user AS (
  SELECT user_id, COUNT(*) AS n, SUM(g) AS sg,
    SUM(CAST(CAST(g AS DOUBLE) * g AS DECIMAL(38,4))) AS sgg
  FROM gaps WHERE g IS NOT NULL
  GROUP BY user_id HAVING COUNT(*) >= 2
),
scored AS (
  SELECT n,
    (sqrt(GREATEST((CAST(sgg AS DOUBLE)
        - CAST(sg AS DOUBLE) * (CAST(sg AS DOUBLE) / n)) / n, 0.0))
      - CAST(sg AS DOUBLE) / n)
    / (sqrt(GREATEST((CAST(sgg AS DOUBLE)
        - CAST(sg AS DOUBLE) * (CAST(sg AS DOUBLE) / n)) / n, 0.0))
      + CAST(sg AS DOUBLE) / n) AS b
  FROM per_user
),
quart AS (
  SELECT b, NTILE(4) OVER (ORDER BY n, b) AS quartile
  FROM (SELECT n, b FROM scored)
)
SELECT quartile, CAST(COUNT(*) AS BIGINT) AS n_users,
  ROUND(CAST(SUM(CAST(b AS DECIMAL(20,12))) / COUNT(*) AS DOUBLE), 6)
    AS mean_burstiness
FROM quart GROUP BY quartile ORDER BY quartile
"""


# ------------------------------------------------------------------ #
# q_catalog_growth
# ------------------------------------------------------------------ #


def q_catalog_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New parts per ship month + the cumulative catalog curve."""
    li = load_table(spark, sf_dir, "lineitem")
    first_seen = li.groupBy("l_partkey").agg(
        F.min(F.trunc("l_shipdate", "month")).alias("m0")
    )
    monthly = first_seen.groupBy("m0").agg(
        F.count("*").alias("new_parts")
    )
    w = Window.orderBy("m0").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return monthly.select(
        F.col("m0").alias("month"),
        "new_parts",
        F.sum("new_parts").over(w).cast("long").alias("catalog_size"),
    ).orderBy("month")


Q_CATALOG_SQL = """
WITH first_seen AS (
  SELECT l_partkey, MIN(date_trunc('month', l_shipdate))::DATE AS m0
  FROM lineitem GROUP BY l_partkey
),
monthly AS (
  SELECT m0, COUNT(*) AS new_parts FROM first_seen GROUP BY m0
)
SELECT m0 AS month, CAST(new_parts AS BIGINT) AS new_parts,
  CAST(SUM(new_parts) OVER (ORDER BY m0
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS catalog_size
FROM monthly ORDER BY month
"""


# ------------------------------------------------------------------ #
# q_churn_risk_flags
# ------------------------------------------------------------------ #


def q_churn_risk_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users whose silence since their last event exceeds 3x their
    median inter-event gap; flagged counts per activity quartile."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    med = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY g)").alias(
            "med_gap"
        ),
    )
    horizon = ev.agg(F.max(F.unix_micros("ts")).alias("now_us"))
    last = ev.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us")
    )
    flagged = (
        med.join(last, "user_id")
        .crossJoin(F.broadcast(horizon))
        .select(
            "n_gaps",
            (
                (F.col("now_us") - F.col("last_us"))
                > 3 * F.col("med_gap")
            ).cast("long").alias("at_risk"),
        )
    )
    # per-user quartiles are unbounded at scale: distributed ntile
    # (tie groups are homogeneous in every aggregated field, so any
    # tie split yields identical per-quartile aggregates)
    quart = global_ntile(
        flagged,
        [F.col("n_gaps").asc(), F.col("at_risk").asc()],
        4,
        out="quartile",
    ).select("at_risk", "quartile")
    return (
        quart.groupBy("quartile")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("at_risk").cast("long").alias("n_at_risk"),
        )
        .orderBy("quartile")
    )


Q_CHURN_SQL = """
WITH gaps AS (
  SELECT user_id,
    epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
      ORDER BY ts, event_id)) AS g
  FROM events
),
med AS (
  SELECT user_id, COUNT(*) AS n_gaps,
    quantile_disc(g, 0.5) AS med_gap
  FROM gaps WHERE g IS NOT NULL GROUP BY user_id
),
horizon AS (SELECT MAX(epoch_us(ts)) AS now_us FROM events),
last AS (
  SELECT user_id, MAX(epoch_us(ts)) AS last_us
  FROM events GROUP BY user_id
),
flagged AS (
  SELECT n_gaps,
    CASE WHEN now_us - last_us > 3 * med_gap THEN 1 ELSE 0 END
      AS at_risk
  FROM med JOIN last USING (user_id) CROSS JOIN horizon
),
quart AS (
  SELECT at_risk,
    NTILE(4) OVER (ORDER BY n_gaps, at_risk) AS quartile
  FROM flagged
)
SELECT quartile, CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(at_risk) AS BIGINT) AS n_at_risk
FROM quart GROUP BY quartile ORDER BY quartile
"""


SPECS = [
    QuerySpec(
        "d_interarrival_burstiness",
        d_interarrival_burstiness,
        D_BURSTY_SQL,
        doc="Goh-Barabasi burstiness of inter-event gaps per quartile",
        tags=("events", "stats"),
    ),
    QuerySpec(
        "q_catalog_growth",
        q_catalog_growth,
        Q_CATALOG_SQL,
        doc="new parts per month + cumulative catalog curve",
        tags=("bi", "inventory"),
    ),
    QuerySpec(
        "q_churn_risk_flags",
        q_churn_risk_flags,
        Q_CHURN_SQL,
        doc="silence > 3x own median gap, per activity quartile",
        tags=("events", "lifecycle"),
    ),
]
