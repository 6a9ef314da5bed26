"""Twenty-fourth wave: sequence-pattern matching, a Python UDAF
surface, multi-level ratio-to-report, and period rank movers.

Reference parity note: the reference's extension surface is the
extractor-plugin registry (SURVEY.md §2.10); `a_weighted_geomean`
extends the engine the same way on the aggregation axis — a
user-defined aggregate plugged into a grouped plan.

- **Journey regex cohorts** (`q_journey_patterns`) — MATCH_RECOGNIZE
  -style sequence classification without a stateful operator: each
  user's ordered event-type initials collapse to one string (one
  grouped sort_array — the string is tiny), then plain `rlike`
  classifies journeys.  Scales as one shuffle by user plus per-row
  regex; the pattern set is a literal CASE chain in codegen.
- **Weighted geometric mean UDAF** (`a_weighted_geomean`) — Arrow
  grouped-agg `pandas_udf`: the canonical "custom aggregate the
  engine lacks".  Inside the worker `math.fsum` makes the reduction
  exactly-rounded → order-independent, so the result is
  deterministic under any partitioning (a naive np.sum would not
  be); the 6dp output round absorbs the ≤1-ulp gap vs the oracle's
  sequential SUM.
- **Ratio-to-report** (`q_ratio_to_report`) — revenue share of each
  nation within its region and of each region within the total:
  decimal revenue sums once, then two window totals over the tiny
  nation-level aggregate (no second pass over the fact table).
- **Rank movers** (`q_rank_movers`) — customers whose revenue rank
  moved most between the early and late half of the order history:
  conditional aggregation gives both periods in ONE scan (no self
  join), two ranks, top movers by |Δrank|.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import global_row_number
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table

#: journey classification patterns (applied to event-type initials;
#: s=signup c=click v=view p=purchase e=error), first match wins.
JOURNEY_PATTERNS = [
    ("activated_buyer", "^s.*p"),
    ("browsing_buyer", "^[cv].*p"),
    ("error_exit", "e$"),
    ("window_shopper", "^[cv][cv]*$"),
    ("other", ""),
]


def q_journey_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify each user's event journey by regex over the ordered
    event-type initial string; report cohort sizes and mean journey
    length."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "ts", "event_id", F.col("event_type").alias("et")
                            )
                        )
                    ),
                    lambda s: F.substring(s["et"], 1, 1),
                ),
                "",
            ).alias("journey")
        )
    )
    cls = F.lit("other")
    for name, pat in reversed(JOURNEY_PATTERNS):
        if pat:
            cls = F.when(F.col("journey").rlike(pat), F.lit(name)).otherwise(
                cls
            )
    classified = per_user.select(
        "user_id", F.length("journey").alias("len"), cls.alias("cohort")
    )
    return (
        classified.groupBy("cohort")
        .agg(
            F.count("*").alias("n_users"),
            F.round(
                F.sum(F.col("len").cast("decimal(20,0)")).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("mean_journey_len"),
        )
        .orderBy("cohort")
    )


def _journey_case_sql() -> str:
    whens = []
    for name, pat in JOURNEY_PATTERNS:
        if pat:
            whens.append(
                f"WHEN regexp_matches(journey, '{pat}') THEN '{name}'"
            )
    return "CASE " + " ".join(whens) + " ELSE 'other' END"


Q_JOURNEY_SQL = f"""
WITH per_user AS (
  SELECT user_id,
    string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id)
      AS journey
  FROM events GROUP BY user_id
),
classified AS (
  SELECT user_id, length(journey) AS len,
    {_journey_case_sql()} AS cohort
  FROM per_user
)
SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_users,
  ROUND(CAST(SUM(CAST(len AS DECIMAL(20,0))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS mean_journey_len
FROM classified GROUP BY cohort ORDER BY cohort
"""


def wgeomean_udaf():
    """Quantity-weighted geometric mean UDAF: exp(Σ w·ln x / Σ w).

    math.fsum → exactly-rounded sums → the aggregate is invariant to
    Arrow batch / partition order (cf. SURVEY.md §2.10 extension
    surface; reference has no UDAF concept, extractors.py:24-100 is
    its only plugin axis).  Built lazily — pandas_udf needs an
    active session to parse the return type.
    """

    @F.pandas_udf("double")
    def _wgeomean(price: pd.Series, qty: pd.Series) -> float:
        num = math.fsum(q * math.log(p) for p, q in zip(price, qty))
        den = math.fsum(qty)
        return float(math.exp(num / den))

    return _wgeomean


def a_weighted_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag quantity-weighted geometric mean unit price via
    a grouped-agg pandas UDAF."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
        F.col("l_quantity").alias("qty"),
    )
    return (
        li.groupBy("l_returnflag")
        .agg(wgeomean_udaf()("unit", "qty").alias("raw"))
        .select(
            "l_returnflag", F.round("raw", 6).alias("wgeomean_unit_price")
        )
        .orderBy("l_returnflag")
    )


A_WGEOMEAN_SQL = """
SELECT l_returnflag,
  ROUND(EXP(SUM(l_quantity * LN(l_extendedprice / l_quantity))
            / SUM(l_quantity)), 6) AS wgeomean_unit_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation revenue share within region and region share of total —
    one fact-table pass, two window ratios over the 25-row rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(rev.cast("decimal(24,6)")).cast("double").alias("rev")
        )
    )
    w_reg = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return base.select(
        "r_name",
        "n_name",
        F.round("rev", 4).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(w_reg), 6).alias(
            "share_of_region"
        ),
        F.round(
            F.sum("rev").over(w_reg) / F.sum("rev").over(w_all), 6
        ).alias("region_share_of_total"),
    ).orderBy("r_name", "n_name")


Q_RATIO_SQL = """
WITH base AS (
  SELECT r_name, n_name,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)))
         AS DOUBLE) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
  ROUND(rev, 4) AS revenue,
  ROUND(rev / SUM(rev) OVER (PARTITION BY r_name), 6)
    AS share_of_region,
  ROUND(SUM(rev) OVER (PARTITION BY r_name) / SUM(rev) OVER (), 6)
    AS region_share_of_total
FROM base ORDER BY r_name, n_name
"""


PIVOT_DATE = "1998-01-01"
TOP_MOVERS = 25


def q_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose spend rank moved most between the early
    (< 1998) and late (>= 1998) halves of the order history."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(
            F.when(
                F.col("o_orderdate") < F.lit(PIVOT_DATE).cast("timestamp"),
                F.col("o_totalprice"),
            )
            .otherwise(0.0)
            .cast("decimal(24,6)")
        )
        .cast("double")
        .alias("early"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= F.lit(PIVOT_DATE).cast("timestamp"),
                F.col("o_totalprice"),
            )
            .otherwise(0.0)
            .cast("decimal(24,6)")
        )
        .cast("double")
        .alias("late"),
    )
    # per-customer ranks are unbounded at scale; the order carries a
    # unique tiebreaker, so rank() == row_number() and the distributed
    # range-partitioned ranking applies
    ranked = global_row_number(
        global_row_number(
            spend,
            [F.col("early").desc(), F.col("o_custkey").asc()],
            "rank_early",
        ),
        [F.col("late").desc(), F.col("o_custkey").asc()],
        "rank_late",
    ).select("o_custkey", "rank_early", "rank_late")
    delta = (F.col("rank_early") - F.col("rank_late")).alias("rank_delta")
    return (
        ranked.select("o_custkey", "rank_early", "rank_late", delta)
        .orderBy(
            F.desc(F.abs(F.col("rank_delta"))), "o_custkey"
        )
        .limit(TOP_MOVERS)
    )


Q_MOVERS_SQL = f"""
WITH spend AS (
  SELECT o_custkey,
    CAST(SUM(CAST(CASE WHEN o_orderdate < TIMESTAMP '{PIVOT_DATE}'
                       THEN o_totalprice ELSE 0.0 END
                  AS DECIMAL(24,6))) AS DOUBLE) AS early,
    CAST(SUM(CAST(CASE WHEN o_orderdate >= TIMESTAMP '{PIVOT_DATE}'
                       THEN o_totalprice ELSE 0.0 END
                  AS DECIMAL(24,6))) AS DOUBLE) AS late
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey,
    RANK() OVER (ORDER BY early DESC, o_custkey) AS rank_early,
    RANK() OVER (ORDER BY late DESC, o_custkey) AS rank_late
  FROM spend
)
SELECT o_custkey, rank_early, rank_late,
  rank_early - rank_late AS rank_delta
FROM ranked
ORDER BY ABS(rank_early - rank_late) DESC, o_custkey
LIMIT {TOP_MOVERS}
"""


SPECS = [
    QuerySpec("q_journey_patterns", q_journey_patterns, Q_JOURNEY_SQL,
              doc="regex sequence-pattern journey cohorts",
              tags=("events", "text")),
    QuerySpec("a_weighted_geomean", a_weighted_geomean, A_WGEOMEAN_SQL,
              doc="grouped-agg pandas UDAF (weighted geometric mean)",
              tags=("udf", "stats")),
    QuerySpec("q_ratio_to_report", q_ratio_to_report, Q_RATIO_SQL,
              doc="multi-level ratio-to-report revenue shares",
              tags=("analytics",)),
    QuerySpec("q_rank_movers", q_rank_movers, Q_MOVERS_SQL,
              doc="biggest rank movers between periods (one-scan)",
              tags=("window",)),
]
