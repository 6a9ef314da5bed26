"""Fortieth wave: point-in-time (feature-store) join.

Reference parity note: the temporal-correctness join every feature
store / lakehouse needs — events enriched with the dimension value
that was valid AT the event's timestamp, never a later one (no
leakage).  Exact DuckDB oracle.

- **Point-in-time join** (`j_point_in_time`) — events joined to the
  wave-14 SCD2 priority intervals of the matching customer: because
  SCD2 intervals are contiguous per key ([valid_from, next
  valid_from)), PIT membership is exactly the as-of pick "greatest
  valid_from ≤ event ts" — so the join runs through
  `operators/joins.py:asof_join` (union + last-value window, ONE
  exchange on the key, no interval explosion), while the oracle
  states the interval predicate directly.  Events before a
  customer's first interval, or for ids with no dimension history,
  report as 'unmatched'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.joins import asof_join
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.plans.wave14 import q_scd2_priority
from idn_area_etl_spark.sources.tables import load_table


def j_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events enriched with the customer priority valid at event
    time; per-priority event counts ('unmatched' = no valid row)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"), F.col("ts"), "event_id"
    )
    dim = q_scd2_priority(spark, sf_dir).select(
        F.col("o_custkey").alias("key"),
        F.col("valid_from").alias("vts"),
        "priority",
    )
    enriched = asof_join(
        ev, dim, key="key", left_ts="ts", right_ts="vts",
        payload_cols=["priority"],
    )
    return (
        enriched.select(
            F.coalesce("asof_priority", F.lit("unmatched")).alias("priority")
        )
        .groupBy("priority")
        .agg(F.count("*").alias("n_events"))
        .orderBy("priority")
    )


J_PIT_SQL = """
WITH flagged AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
    CASE WHEN LAG(o_orderpriority) OVER w IS NULL
           OR LAG(o_orderpriority) OVER w <> o_orderpriority
         THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
runs AS (
  SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
    ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM flagged
),
iv AS (
  SELECT o_custkey, run_id,
    ANY_VALUE(o_orderpriority) AS priority,
    MIN(o_orderdate) AS valid_from
  FROM runs GROUP BY o_custkey, run_id
),
intervals AS (
  SELECT o_custkey, priority, valid_from,
    LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id)
      AS valid_to
  FROM iv
),
enriched AS (
  SELECT e.event_id, i.priority
  FROM events e
  LEFT JOIN intervals i
    ON i.o_custkey = e.user_id
   AND i.valid_from <= e.ts
   AND (e.ts < i.valid_to OR i.valid_to IS NULL)
)
SELECT COALESCE(priority, 'unmatched') AS priority,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM enriched GROUP BY 1 ORDER BY priority
"""


SPECS = [
    QuerySpec(
        "j_point_in_time",
        j_point_in_time,
        J_PIT_SQL,
        doc="feature-store PIT join: event-time-valid SCD2 attribute",
        tags=("join", "temporal", "scd2"),
    ),
]
