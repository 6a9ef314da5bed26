"""Fourteenth wave: temporal/interval analytics + privacy audit.

Classic warehouse/ETL shapes the reference never needed but a general
engine must serve (SURVEY §2.4/§2.5 note these are engine-native):

- **SCD2 interval build** (gaps-and-islands): collapse each customer's
  order-priority history into validity intervals — the standard
  slowly-changing-dimension type-2 construction (lag → change flag →
  cumulative run id → per-run min/max + lead).  One shuffle on the
  partition key; every window shares the same (custkey) partitioning
  so Spark reuses a single sort.
- **Max-concurrency interval sweep**: +1/-1 event-boundary sweep over
  per-user sessions — the O(n log n) alternative to an interval
  self-join (which would be O(n²) at 100 TB).  The only global
  ordering is over session *boundaries* (2 rows per session), orders
  of magnitude smaller than the raw events.
- **Rolling exact median** over a 7-row frame (always odd → the sorted
  middle element is picked exactly on both engines, bit-for-bit).
- **Markov transition matrix**: lead() bigrams of each user's event
  sequence → P(next | current); a single shuffle on user_id then a
  tiny groupBy.
- **k-anonymity audit**: quasi-identifier group sizes below k — the
  privacy screen a training-data pipeline runs before release.

Determinism: decimal(24,6) sums before DOUBLE casts, unique
tiebreakers under every window order, integer counts cast BIGINT on
the DuckDB side (sum(int) is HUGEINT there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import global_running_sum
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


def q_scd2_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals of each customer's order priority.

    Consecutive orders with the same priority collapse into one
    interval [valid_from, valid_to); valid_to is NULL for the
    current (last) run.  All three windows share the same
    partitionBy(custkey) → one exchange + one sort in the plan.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    runs = o.select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
        F.when(
            F.lag("o_orderpriority").over(w).isNull()
            | (F.lag("o_orderpriority").over(w) != F.col("o_orderpriority")),
            1,
        ).otherwise(0).alias("chg"),
    ).withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = runs.groupBy("o_custkey", "run_id").agg(
        F.first("o_orderpriority").alias("priority"),
        F.min("o_orderdate").alias("valid_from"),
        F.max("o_orderdate").alias("last_seen"),
        F.count("*").alias("n_orders"),
    )
    wv = Window.partitionBy("o_custkey").orderBy("run_id")
    return iv.select(
        "o_custkey",
        "priority",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "last_seen",
        "n_orders",
    ).orderBy("o_custkey", "valid_from")


Q_SCD2_SQL = """
WITH flagged AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
    CASE WHEN LAG(o_orderpriority) OVER w IS NULL
           OR LAG(o_orderpriority) OVER w <> o_orderpriority THEN 1
         ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
runs AS (
  SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
),
iv AS (
  SELECT o_custkey, run_id,
    MIN(o_orderpriority) AS priority,
    MIN(o_orderdate) AS valid_from,
    MAX(o_orderdate) AS last_seen,
    CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM runs GROUP BY o_custkey, run_id
)
SELECT o_custkey, priority, valid_from,
  LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id)
    AS valid_to,
  last_seen, n_orders
FROM iv
ORDER BY o_custkey, valid_from
"""


def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day peak number of simultaneously open user sessions.

    Sessions = built-in session_window (30 min gap; parity with the
    manual lag/cumsum formulation proven by q_session_window_native).
    Sweep: +1 at session start, -1 after session end; at equal ts
    starts sort first (delta DESC) so touching/point sessions count
    as open.  The running sum runs over session *boundaries* (~2 rows
    per session), not raw events — the scalable sweep.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n")).select(
        F.col("w.start").alias("s"),
        (F.col("w.end") - F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    points = sess.select(F.col("s").alias("ts"), F.lit(1).alias("delta")).unionAll(
        sess.select(F.col("e").alias("ts"), F.lit(-1).alias("delta"))
    )
    # session-boundary cardinality is unbounded — the sweep's running
    # sum comes from the distributed range-partitioned primitive.
    # Ties within (ts, delta) may split across range partitions; the
    # multiset of running values over a tie group is order-invariant,
    # so the per-day max is unchanged.
    running = global_running_sum(
        points,
        [F.col("ts").asc(), F.col("delta").desc()],
        F.col("delta"),
        out="open_now",
    ).select(F.date_trunc("day", "ts").alias("day"), "open_now")
    return (
        running.groupBy("day")
        .agg(F.max("open_now").alias("peak_concurrent"))
        .orderBy("day")
    )


Q_MAX_CONCURRENCY_SQL = """
WITH o AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
         ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
sess AS (
  SELECT MIN(ts) AS s, MAX(ts) AS e FROM s GROUP BY user_id, sid
),
points AS (
  SELECT s AS ts, 1 AS delta FROM sess
  UNION ALL
  SELECT e AS ts, -1 AS delta FROM sess
),
running AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    CAST(SUM(delta) OVER (ORDER BY ts, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS open_now
  FROM points
)
SELECT day, MAX(open_now) AS peak_concurrent
FROM running GROUP BY day ORDER BY day
"""


def q_rolling_median_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day rolling median of daily revenue.

    The frame is only emitted once it holds exactly 7 rows, so both
    engines pick the sorted middle element — no even-count
    interpolation, bit-identical doubles.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(24,6)"))
        .cast("double")
        .alias("rev")
    )
    w = Window.orderBy("day")
    frame = w.rowsBetween(-6, 0)
    return (
        daily.select(
            "day",
            "rev",
            # interpolation-safe despite F.percentile: the rn >= 7
            # filter keeps only FULL 7-row frames, where the median
            # rank 0.5*(7-1)=3 is an exact integer, so both engines
            # return the stored 4th element with no interpolation
            # arithmetic (the partial even-count edge frames that
            # WOULD interpolate are filtered out)
            F.percentile("rev", F.lit(0.5)).over(frame).alias("med7"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") >= 7)
        .select("day", "rev", "med7")
        .orderBy("day")
    )


Q_ROLLING_MEDIAN_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
),
r AS (
  SELECT day, rev,
    median(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING
                      AND CURRENT ROW) AS med7,
    ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM daily
)
SELECT day, rev, med7 FROM r WHERE rn >= 7 ORDER BY day
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix of user event sequences.

    lead() bigrams per user (ties broken by event_id), then
    P(next | current) as a single per-row double division —
    deterministic on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_event"),
        F.lead("event_type").over(w).alias("to_event"),
    ).filter(F.col("to_event").isNotNull())
    counts = pairs.groupBy("from_event", "to_event").agg(
        F.count("*").alias("n")
    )
    wtot = Window.partitionBy("from_event")
    return counts.select(
        "from_event",
        "to_event",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wtot).cast("double"))
        .alias("prob"),
    ).orderBy("from_event", "to_event")


Q_EVENT_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type AS from_event,
    LEAD(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS to_event
  FROM events
),
counts AS (
  SELECT from_event, to_event, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE to_event IS NOT NULL
  GROUP BY from_event, to_event
)
SELECT from_event, to_event, n,
  CAST(n AS DOUBLE)
    / CAST(SUM(n) OVER (PARTITION BY from_event) AS DOUBLE) AS prob
FROM counts ORDER BY from_event, to_event
"""


K_ANON_THRESHOLD = 5


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: quasi-identifier groups smaller than k.

    Quasi-identifiers = (nation, market segment, account-balance
    kilobucket).  Groups below the threshold are re-identification
    risks a release pipeline must generalize or suppress.  One
    map-side-combinable groupBy — no window, no second shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_kbucket"),
        )
        .agg(F.count("*").alias("group_size"))
        .filter(F.col("group_size") < K_ANON_THRESHOLD)
        .orderBy("c_nationkey", "c_mktsegment", "bal_kbucket")
    )


Q_K_ANON_SQL = f"""
SELECT c_nationkey, c_mktsegment,
  CAST(FLOOR(c_acctbal / 1000) AS INT) AS bal_kbucket,
  CAST(COUNT(*) AS BIGINT) AS group_size
FROM customer
GROUP BY 1, 2, 3
HAVING COUNT(*) < {K_ANON_THRESHOLD}
ORDER BY c_nationkey, c_mktsegment, bal_kbucket
"""


SPECS = [
    QuerySpec("q_scd2_priority", q_scd2_priority, Q_SCD2_SQL,
              doc="SCD2 gaps-and-islands validity intervals",
              tags=("window", "etl")),
    QuerySpec("q_max_concurrency", q_max_concurrency, Q_MAX_CONCURRENCY_SQL,
              doc="interval sweep: per-day peak concurrent sessions",
              tags=("window", "events")),
    QuerySpec("q_rolling_median_revenue", q_rolling_median_revenue,
              Q_ROLLING_MEDIAN_SQL,
              doc="exact 7-day rolling median (odd frame, bit-exact)",
              tags=("window",)),
    QuerySpec("q_event_transitions", q_event_transitions,
              Q_EVENT_TRANSITIONS_SQL,
              doc="Markov transition matrix over user event sequences",
              tags=("events",)),
    QuerySpec("q_k_anonymity", q_k_anonymity, Q_K_ANON_SQL,
              doc="k-anonymity quasi-identifier audit",
              tags=("privacy",)),
]
