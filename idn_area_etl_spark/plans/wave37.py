"""Thirty-seventh wave: linear gap-fill interpolation, price/volume
waterfall decomposition, and rank normalization.

Reference parity note: engine-native time-series/BI/prep analytics;
every query carries an exact DuckDB oracle.

- **Linear gap-fill** (`q_linear_gapfill`) — reconstruct a complete
  daily 'error'-event count series: generate the full day axis
  (sequence — no external calendar), left-join observed days, then
  linearly interpolate interior gaps from the previous/next known
  points using IGNORE NULLS window lookups (one ordered window pass
  over the day axis, which is calendar-bounded — never fact-scale).
  Exact arithmetic: the interpolation weight is a ratio of integer
  day distances evaluated identically on both engines.
- **Price/volume decomposition** (`q_price_volume_waterfall`) — the
  BI waterfall: revenue change between two periods split into volume
  effect Σ(q₂−q₁)·p₁ and price effect Σ(p₂−p₁)·q₂ per part
  (Laspeyres volume / Paasche price — the pair that sums exactly to
  Δrevenue).  Conditional aggregation gives both periods in ONE
  lineitem pass; all terms exact decimal.
- **Rank normalization** (`q_rank_normalize`) — percent-rank feature
  scaling of account balances within market segment + the top
  customer per segment after scaling: the monotone-invariant
  normalization used before quantile-sensitive models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import grouped_running_multi
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table

# ------------------------------------------------------------------ #
# q_linear_gapfill
# ------------------------------------------------------------------ #


def q_linear_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete daily error-count series with linear interpolation of
    interior gaps (edges keep NULL — no extrapolation)."""
    ev = load_table(spark, sf_dir, "events")
    # thin the series so gaps actually exist: only even days observed
    daily = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.dayofmonth("day") % 2 == 0)
    )
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    axis = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = axis.join(daily, "day", "left")
    w = Window.orderBy("day")
    w_prev = w.rowsBetween(Window.unboundedPreceding, 0)
    w_next = w.rowsBetween(0, Window.unboundedFollowing)
    prev_val = F.last("cnt", ignorenulls=True).over(w_prev)
    next_val = F.first("cnt", ignorenulls=True).over(w_next)
    prev_day = F.last(
        F.when(F.col("cnt").isNotNull(), F.col("day")), ignorenulls=True
    ).over(w_prev)
    next_day = F.first(
        F.when(F.col("cnt").isNotNull(), F.col("day")), ignorenulls=True
    ).over(w_next)
    span = F.datediff(next_day, prev_day).cast("double")
    offset = F.datediff(F.col("day"), prev_day).cast("double")
    interp = (
        prev_val.cast("double")
        + (next_val.cast("double") - prev_val.cast("double"))
        * offset
        / span
    )
    filled = F.when(F.col("cnt").isNotNull(), F.col("cnt").cast("double")) \
        .when(prev_val.isNotNull() & next_val.isNotNull(), interp)
    return joined.select(
        "day",
        F.col("cnt").alias("observed"),
        F.round(filled, 6).alias("filled"),
    ).orderBy("day")


Q_GAPFILL_SQL = """
WITH daily AS (
  SELECT day, cnt FROM (
    SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
    FROM events WHERE event_type = 'error' GROUP BY 1
  ) WHERE dayofmonth(day) % 2 = 0
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
axis AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
),
joined AS (
  SELECT a.day, d.cnt FROM axis a LEFT JOIN daily d USING (day)
),
looked AS (
  SELECT day, cnt,
    LAST_VALUE(cnt IGNORE NULLS) OVER (ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
    FIRST_VALUE(cnt IGNORE NULLS) OVER (ORDER BY day
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
    LAST_VALUE(CASE WHEN cnt IS NOT NULL THEN day END IGNORE NULLS)
      OVER (ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
    FIRST_VALUE(CASE WHEN cnt IS NOT NULL THEN day END IGNORE NULLS)
      OVER (ORDER BY day
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
  FROM joined
)
SELECT day, CAST(cnt AS BIGINT) AS observed,
  ROUND(CASE
    WHEN cnt IS NOT NULL THEN CAST(cnt AS DOUBLE)
    WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
      CAST(prev_val AS DOUBLE)
      + (CAST(next_val AS DOUBLE) - CAST(prev_val AS DOUBLE))
        * CAST(date_diff('day', prev_day, day) AS DOUBLE)
        / CAST(date_diff('day', prev_day, next_day) AS DOUBLE)
  END, 6) AS filled
FROM looked ORDER BY day
"""


# ------------------------------------------------------------------ #
# q_price_volume_waterfall
# ------------------------------------------------------------------ #

PERIOD_SPLIT = "1998-05-01"


def q_price_volume_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Δrevenue between halves decomposed into volume (Laspeyres) and
    price (Paasche) effects per returnflag — exact decimal, and the
    two effects sum exactly to the revenue delta for parts present in
    both periods."""
    li = load_table(spark, sf_dir, "lineitem")
    is_p2 = F.to_date("l_shipdate") >= PERIOD_SPLIT
    per_part = li.groupBy("l_returnflag", "l_partkey").agg(
        F.sum(
            F.when(~is_p2, F.col("l_quantity")).otherwise(0.0).cast(
                "decimal(20,2)"
            )
        ).alias("q1"),
        F.sum(
            F.when(is_p2, F.col("l_quantity")).otherwise(0.0).cast(
                "decimal(20,2)"
            )
        ).alias("q2"),
        F.sum(
            F.when(~is_p2, F.col("l_extendedprice")).otherwise(0.0).cast(
                "decimal(24,6)"
            )
        ).alias("r1"),
        F.sum(
            F.when(is_p2, F.col("l_extendedprice")).otherwise(0.0).cast(
                "decimal(24,6)"
            )
        ).alias("r2"),
    )
    both = per_part.filter((F.col("q1") > 0) & (F.col("q2") > 0))
    p1 = F.col("r1").cast("double") / F.col("q1").cast("double")
    p2 = F.col("r2").cast("double") / F.col("q2").cast("double")
    vol_eff = (F.col("q2").cast("double") - F.col("q1").cast("double")) * p1
    price_eff = (p2 - p1) * F.col("q2").cast("double")
    return (
        both.select(
            "l_returnflag",
            F.col("r1"),
            F.col("r2"),
            vol_eff.cast("decimal(28,8)").alias("ve"),
            price_eff.cast("decimal(28,8)").alias("pe"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("r1").cast("double").alias("rev_p1"),
            F.sum("r2").cast("double").alias("rev_p2"),
            F.round(F.sum("ve").cast("double"), 4).alias("volume_effect"),
            F.round(F.sum("pe").cast("double"), 4).alias("price_effect"),
        )
        .orderBy("l_returnflag")
    )


Q_WATERFALL_SQL = f"""
WITH per_part AS (
  SELECT l_returnflag, l_partkey,
    SUM(CAST(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '{PERIOD_SPLIT}'
             THEN 0.0 ELSE l_quantity END AS DECIMAL(20,2))) AS q1,
    SUM(CAST(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '{PERIOD_SPLIT}'
             THEN l_quantity ELSE 0.0 END AS DECIMAL(20,2))) AS q2,
    SUM(CAST(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '{PERIOD_SPLIT}'
             THEN 0.0 ELSE l_extendedprice END AS DECIMAL(24,6))) AS r1,
    SUM(CAST(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '{PERIOD_SPLIT}'
             THEN l_extendedprice ELSE 0.0 END AS DECIMAL(24,6))) AS r2
  FROM lineitem GROUP BY 1, 2
),
both_p AS (SELECT * FROM per_part WHERE q1 > 0 AND q2 > 0),
effects AS (
  SELECT l_returnflag, r1, r2,
    CAST((CAST(q2 AS DOUBLE) - CAST(q1 AS DOUBLE))
         * (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
      AS DECIMAL(28,8)) AS ve,
    CAST((CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)
          - CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
         * CAST(q2 AS DOUBLE)
      AS DECIMAL(28,8)) AS pe
  FROM both_p
)
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_parts,
  CAST(SUM(r1) AS DOUBLE) AS rev_p1,
  CAST(SUM(r2) AS DOUBLE) AS rev_p2,
  ROUND(CAST(SUM(ve) AS DOUBLE), 4) AS volume_effect,
  ROUND(CAST(SUM(pe) AS DOUBLE), 4) AS price_effect
FROM effects GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ------------------------------------------------------------------ #
# q_rank_normalize
# ------------------------------------------------------------------ #


def q_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-rank scaling of acctbal within segment; per-segment
    count + top-scaled customer.

    Scale (r7, window-funnel gate): c_mktsegment has a 5-value
    domain, so per-segment windows would stream a fifth of the
    customer table through one task each.  percent_rank over a UNIQUE
    ordering equals (row_number-1)/(n-1), so the scaled value comes
    from ``ranks.grouped_running_multi`` positions, and the top-scaled
    row per segment from one map-side-combinable ``min_by`` over the
    unique (-scaled, custkey) ordering key."""
    c = load_table(spark, sf_dir, "customer")
    pos = grouped_running_multi(
        c.select("c_mktsegment", "c_acctbal", "c_custkey"),
        ["c_mktsegment"],
        [F.col("c_acctbal"), F.col("c_custkey")],
        {"one": F.lit(1)},
    )
    scaled = pos.select(
        "c_mktsegment",
        "c_custkey",
        F.round(
            # SQL contract: percent_rank of a 1-row partition is 0
            F.when(
                F.col("gtot_one") > 1,
                (F.col("grun_one") - 1).cast("double")
                / (F.col("gtot_one") - 1).cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("scaled"),
    )
    winner = scaled.groupBy("c_mktsegment").agg(
        F.min_by(
            F.struct(
                F.col("c_custkey").alias("ck"),
                F.col("scaled").alias("sc"),
            ),
            F.struct(
                (-F.col("scaled")).alias("neg_scaled"),
                F.col("c_custkey").alias("ck"),
            ),
        ).alias("t")
    )
    return winner.select(
        "c_mktsegment",
        F.col("t.ck").alias("top_custkey"),
        F.col("t.sc").alias("top_scaled"),
    ).orderBy("c_mktsegment")


Q_RANKNORM_SQL = """
WITH scaled AS (
  SELECT c_mktsegment, c_custkey,
    ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
      ORDER BY c_acctbal, c_custkey), 6) AS scaled
  FROM customer
)
SELECT c_mktsegment, c_custkey AS top_custkey, scaled AS top_scaled
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
    ORDER BY scaled DESC, c_custkey) AS rn
  FROM scaled
) WHERE rn = 1
ORDER BY c_mktsegment
"""


SPECS = [
    QuerySpec(
        "q_linear_gapfill",
        q_linear_gapfill,
        Q_GAPFILL_SQL,
        doc="daily series completion with linear gap interpolation",
        tags=("timeseries",),
    ),
    QuerySpec(
        "q_price_volume_waterfall",
        q_price_volume_waterfall,
        Q_WATERFALL_SQL,
        doc="revenue delta split into volume and price effects",
        tags=("analytics", "bi"),
    ),
    QuerySpec(
        "q_rank_normalize",
        q_rank_normalize,
        Q_RANKNORM_SQL,
        doc="percent-rank feature scaling within segment",
        tags=("prep", "window"),
    ),
]
