"""Seventeenth wave: incremental rollup refresh, fixed-size group
sampling, sessionized funnels.

- **Incremental rollup refresh** — the materialized-view maintenance
  pattern: a pre-aggregated base partition merged with a fresh delta
  partition must equal the full recompute BIT-FOR-BIT.  Decimal
  partial sums make the merge exact, so the oracle (which computes
  the rollup directly over all rows) is also the proof that
  merge-refresh loses nothing.  At 100 TB this is the difference
  between re-scanning history daily and touching only the new
  partition.
- **Fixed-size per-group sampling** — k docs per language by salted
  md5 rank: deterministic, partition-invariant, single window pass —
  the reservoir-sampling replacement that needs no RNG state.
- **Sessionized funnel** — strict-order milestone progression
  *within* 30-minute sessions (session assignment proven equal to
  the manual lag/cumsum oracle by q_session_window_native).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import grouped_topk
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


ROLLUP_CUTOFF = "2000-01-01"


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue rollup maintained incrementally.

    base = orders before the cutoff (the materialized history),
    delta = orders since (the newly-landed partition).  Each side
    pre-aggregates to (month, decimal sum, count) — map-side
    combinable — and the merge is a tiny groupBy over ~2× months
    rows.  Equality with the oracle's direct full recompute proves
    the refresh is lossless.
    """
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate").alias("month")
    dec = F.col("o_totalprice").cast("decimal(24,6)")

    def part_agg(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.sum(dec).alias("rev_part"),
            F.count("*").alias("n_part"),
        )

    base = part_agg(o.filter(F.col("o_orderdate") < F.lit(ROLLUP_CUTOFF)))
    delta = part_agg(o.filter(F.col("o_orderdate") >= F.lit(ROLLUP_CUTOFF)))
    merged = (
        base.unionByName(delta)
        .groupBy("month")
        .agg(
            F.sum("rev_part").cast("double").alias("revenue"),
            F.sum("n_part").alias("n_orders"),
        )
    )
    return merged.orderBy("month")


Q_INCREMENTAL_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1
ORDER BY month
"""


GROUP_SAMPLE_K = 3


def s_group_sample_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-language document sample by salted md5 rank —
    deterministic and partition-invariant (row-local hash, one
    window per group)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("gsample:"), F.col("doc_id").cast("string")))
    # r7, window-funnel gate: lang has a fixed taxonomy, so a plain
    # per-lang window would stream each language's whole document set
    # through one task; grouped_topk is result-identical (unique
    # (md5, doc_id) tiebreaker) with groups x buckets parallelism
    return (
        grouped_topk(
            docs,
            ["lang"],
            [h.asc(), F.col("doc_id")],
            GROUP_SAMPLE_K,
            salt_key=F.col("doc_id"),
            out="rn",
        )
        .select("lang", "doc_id", "source", F.col("rn").cast("int").alias("rn"))
        .orderBy("lang", "rn")
    )


S_GROUP_SAMPLE_SQL = f"""
WITH ranked AS (
  SELECT lang, doc_id, source,
    ROW_NUMBER() OVER (
      PARTITION BY lang
      ORDER BY md5('gsample:' || CAST(doc_id AS VARCHAR)), doc_id
    ) AS rn
  FROM documents
)
SELECT lang, doc_id, source, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= {GROUP_SAMPLE_K}
ORDER BY lang, rn
"""


def q_sessionized_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session funnel: sessions whose milestone mins occur in
    strict order signup < view < purchase.

    Sessions = built-in session_window (30 min gap).  Milestones use
    each type's MIN ts inside the session; strict inequalities give
    the ordered-progression funnel.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    day = F.date_trunc("day", F.col("w.start")).alias("day")
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & F.col("t_view").isNotNull() & (F.col("t_view") > F.col("t_signup"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") > F.col("t_view")
    )
    return (
        sess.select(
            day,
            s1.cast("int").alias("has_signup"),
            s2.cast("int").alias("signup_view"),
            s3.cast("int").alias("signup_view_purchase"),
        )
        .groupBy("day")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("has_signup").alias("n_signup"),
            F.sum("signup_view").alias("n_signup_view"),
            F.sum("signup_view_purchase").alias("n_full_funnel"),
        )
        .orderBy("day")
    )


Q_SESSION_FUNNEL_SQL = """
WITH o AS (
  SELECT user_id, ts, event_type,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
         ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_type,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
sess AS (
  SELECT user_id, sid, MIN(ts) AS session_start,
    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM s GROUP BY user_id, sid
),
flags AS (
  SELECT CAST(date_trunc('day', session_start) AS TIMESTAMP) AS day,
    CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END AS has_signup,
    CASE WHEN t_signup IS NOT NULL AND t_view IS NOT NULL
           AND t_view > t_signup THEN 1 ELSE 0 END AS signup_view,
    CASE WHEN t_signup IS NOT NULL AND t_view IS NOT NULL
           AND t_view > t_signup AND t_purchase IS NOT NULL
           AND t_purchase > t_view THEN 1 ELSE 0 END
      AS signup_view_purchase
  FROM sess
)
SELECT day,
  CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(SUM(has_signup) AS BIGINT) AS n_signup,
  CAST(SUM(signup_view) AS BIGINT) AS n_signup_view,
  CAST(SUM(signup_view_purchase) AS BIGINT) AS n_full_funnel
FROM flags GROUP BY day ORDER BY day
"""


SPECS = [
    QuerySpec("q_incremental_rollup", q_incremental_rollup, Q_INCREMENTAL_SQL,
              doc="lossless incremental rollup refresh (base + delta == full)",
              tags=("etl",)),
    QuerySpec("s_group_sample_fixed", s_group_sample_fixed, S_GROUP_SAMPLE_SQL,
              doc="exactly-k-per-group deterministic md5-rank sample",
              tags=("sampling",)),
    QuerySpec("q_sessionized_funnel", q_sessionized_funnel, Q_SESSION_FUNNEL_SQL,
              doc="strict-order milestone funnel within 30-min sessions",
              tags=("window", "events")),
]
