"""Thirty-fifth wave: distribution-drift and dependence statistics —
PSI, the two-sample KS statistic, and mutual information.

Reference parity note: engine-native ML-ops statistics; every query
carries an exact DuckDB oracle.

- **PSI drift** (`q_psi_drift`) — population stability index between
  the first and second half of the event stream: decile bin edges
  come from the REFERENCE half only (threshold-broadcast pattern),
  both halves bucket per-row, PSI = Σ (p−q)·ln(p/q) with
  Laplace-smoothed shares.  The standard model-monitoring drift
  gauge, as two aggs + a broadcast.
- **KS two-sample** (`q_ks_two_sample`) — the exact Kolmogorov-
  Smirnov statistic between purchase and click value distributions:
  union both samples on the value axis, two running counts in ONE
  ordered window pass over the distinct-value rollup, D = max
  |ECDF₁ − ECDF₂|.  Exact — no binning — yet never touches a
  per-row sort of the raw stream (the rollup is by distinct value).
- **Mutual information** (`a_mutual_information`) — MI between
  event type and value quartile: the contingency table is one
  count aggregation; marginals ride two window sums over the tiny
  table; MI = Σ p·ln(p/(px·py)) in exact-count arithmetic with the
  log applied per cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import global_running_multi
from idn_area_etl_spark.operators.ranks import discrete_quantiles
from idn_area_etl_spark.plans.registry import QuerySpec, discrete_thresholds_sql
from idn_area_etl_spark.sources.tables import load_table

# ------------------------------------------------------------------ #
# q_psi_drift
# ------------------------------------------------------------------ #

PSI_BUCKETS = 10
PSI_SMOOTH = 0.5  # Laplace smoothing per bin


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of event value distribution: first half (reference) vs
    second half (current), decile bins from the reference half."""
    ev = load_table(spark, sf_dir, "events")
    # discrete split point (the stored epoch-microsecond at rank
    # ceil(n/2)) — an integer both engines hold bit-identically (r7:
    # no interpolated percentiles)
    split = discrete_quantiles(
        ev, F.unix_micros("ts"), [(1, 2)], prefix="split_us"
    ).select(F.col("split_us0").alias("split_us"))
    tagged = ev.crossJoin(F.broadcast(split)).select(
        "value",
        (F.unix_micros("ts") <= F.col("split_us")).alias("is_ref"),
    )
    qs = [(i, PSI_BUCKETS) for i in range(1, PSI_BUCKETS)]
    thr = discrete_quantiles(tagged.filter("is_ref"), F.col("value"), qs)
    bucket = 1 + sum(
        (F.col("value") > F.col(f"t{i}")).cast("int")
        for i in range(len(qs))
    )
    bucketed = tagged.crossJoin(F.broadcast(thr)).select(
        bucket.alias("bucket"), "is_ref"
    )
    counts = bucketed.groupBy("bucket").agg(
        F.sum(F.col("is_ref").cast("long")).alias("n_ref"),
        F.sum((~F.col("is_ref")).cast("long")).alias("n_cur"),
    )
    w_all = Window.partitionBy()
    sm = F.lit(PSI_SMOOTH)
    p = (F.col("n_ref").cast("double") + sm) / (
        F.sum("n_ref").over(w_all).cast("double")
        + sm * PSI_BUCKETS
    )
    q_ = (F.col("n_cur").cast("double") + sm) / (
        F.sum("n_cur").over(w_all).cast("double")
        + sm * PSI_BUCKETS
    )
    per_bin = counts.select(
        "bucket",
        "n_ref",
        "n_cur",
        ((p - q_) * F.log(p / q_)).cast("decimal(24,12)").alias("psi_term"),
    )
    return per_bin.agg(
        F.sum("n_ref").cast("long").alias("n_ref"),
        F.sum("n_cur").cast("long").alias("n_cur"),
        F.round(F.sum("psi_term").cast("double"), 6).alias("psi"),
    )


def _psi_sql() -> str:
    qs = [(i, PSI_BUCKETS) for i in range(1, PSI_BUCKETS)]
    thr = discrete_thresholds_sql(
        "(SELECT value FROM tagged WHERE is_ref)", "value", qs
    )
    split = discrete_thresholds_sql(
        "events", "epoch_us(ts)", [(1, 2)], "split_us"
    )
    ex = " + ".join(
        f"CASE WHEN value > t{i} THEN 1 ELSE 0 END"
        for i in range(len(qs))
    )
    return f"""
WITH split AS (
  SELECT split_us0 AS split_us FROM {split}
),
tagged AS (
  SELECT value, epoch_us(ts) <= split_us AS is_ref
  FROM events CROSS JOIN split
),
thr AS (SELECT * FROM {thr}),
bucketed AS (
  SELECT 1 + ({ex}) AS bucket, is_ref
  FROM tagged CROSS JOIN thr
),
counts AS (
  SELECT bucket,
    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
    SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
  FROM bucketed GROUP BY bucket
),
terms AS (
  SELECT n_ref, n_cur,
    CAST(((CAST(n_ref AS DOUBLE) + {PSI_SMOOTH})
            / (SUM(CAST(n_ref AS DOUBLE)) OVER ()
               + {PSI_SMOOTH} * {PSI_BUCKETS})
          - (CAST(n_cur AS DOUBLE) + {PSI_SMOOTH})
            / (SUM(CAST(n_cur AS DOUBLE)) OVER ()
               + {PSI_SMOOTH} * {PSI_BUCKETS}))
      * LN(((CAST(n_ref AS DOUBLE) + {PSI_SMOOTH})
            / (SUM(CAST(n_ref AS DOUBLE)) OVER ()
               + {PSI_SMOOTH} * {PSI_BUCKETS}))
           / ((CAST(n_cur AS DOUBLE) + {PSI_SMOOTH})
              / (SUM(CAST(n_cur AS DOUBLE)) OVER ()
                 + {PSI_SMOOTH} * {PSI_BUCKETS})))
      AS DECIMAL(24,12)) AS psi_term
  FROM counts
)
SELECT CAST(SUM(n_ref) AS BIGINT) AS n_ref,
  CAST(SUM(n_cur) AS BIGINT) AS n_cur,
  ROUND(CAST(SUM(psi_term) AS DOUBLE), 6) AS psi
FROM terms
"""


# ------------------------------------------------------------------ #
# q_ks_two_sample
# ------------------------------------------------------------------ #


def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact KS statistic between purchase and click value samples."""
    ev = load_table(spark, sf_dir, "events")
    sample = ev.filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        "value", (F.col("event_type") == "purchase").alias("is_a")
    )
    rolled = sample.groupBy("value").agg(
        F.sum(F.col("is_a").cast("long")).alias("ca"),
        F.sum((~F.col("is_a")).cast("long")).alias("cb"),
    )
    # distinct-value cardinality is unbounded — both empirical CDFs
    # (running + total for ca and cb) from ONE distributed range
    # shuffle, no single-partition window
    cdfs = global_running_multi(
        rolled,
        [F.col("value").asc()],
        {"ca": F.col("ca"), "cb": F.col("cb")},
    )
    diff = F.abs(
        F.col("cum_ca").cast("double") / F.col("tot_ca").cast("double")
        - F.col("cum_cb").cast("double") / F.col("tot_cb").cast("double")
    )
    stepped = cdfs.select(
        F.col("tot_ca").alias("n_a"),
        F.col("tot_cb").alias("n_b"),
        F.round(diff, 6).alias("d"),
    )
    return stepped.agg(
        F.first("n_a").cast("long").alias("n_purchase"),
        F.first("n_b").cast("long").alias("n_click"),
        F.max("d").alias("ks_stat"),
    )


Q_KS_SQL = """
WITH sample AS (
  SELECT value, event_type = 'purchase' AS is_a
  FROM events WHERE event_type IN ('purchase', 'click')
),
rolled AS (
  SELECT value,
    SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
    SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
  FROM sample GROUP BY value
),
stepped AS (
  SELECT
    SUM(ca) OVER () AS n_a,
    SUM(cb) OVER () AS n_b,
    ROUND(ABS(
      CAST(SUM(ca) OVER (ORDER BY value
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        / CAST(SUM(ca) OVER () AS DOUBLE)
      - CAST(SUM(cb) OVER (ORDER BY value
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        / CAST(SUM(cb) OVER () AS DOUBLE)), 6) AS d
  FROM rolled
)
SELECT CAST(ANY_VALUE(n_a) AS BIGINT) AS n_purchase,
  CAST(ANY_VALUE(n_b) AS BIGINT) AS n_click,
  MAX(d) AS ks_stat
FROM stepped
"""


# ------------------------------------------------------------------ #
# a_mutual_information
# ------------------------------------------------------------------ #

MI_BUCKETS = 4


def a_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MI between event type and value quartile (nats)."""
    ev = load_table(spark, sf_dir, "events")
    qs = [(i, MI_BUCKETS) for i in range(1, MI_BUCKETS)]
    # discrete quartile thresholds (r7: no interpolated percentiles)
    thr = discrete_quantiles(ev, F.col("value"), qs)
    bucket = 1 + sum(
        (F.col("value") > F.col(f"t{i}")).cast("int")
        for i in range(len(qs))
    )
    cont = (
        ev.crossJoin(F.broadcast(thr))
        .select("event_type", bucket.alias("vq"))
        .groupBy("event_type", "vq")
        .agg(F.count("*").alias("nxy"))
    )
    w_all = Window.partitionBy()
    w_x = Window.partitionBy("event_type")
    w_y = Window.partitionBy("vq")
    n = F.sum("nxy").over(w_all).cast("double")
    pxy = F.col("nxy").cast("double") / n
    px = F.sum("nxy").over(w_x).cast("double") / n
    py = F.sum("nxy").over(w_y).cast("double") / n
    terms = cont.select(
        (pxy * F.log(pxy / (px * py))).cast("decimal(24,12)").alias("term"),
        F.col("nxy"),
    )
    return terms.agg(
        F.sum("nxy").cast("long").alias("n_events"),
        F.round(F.sum("term").cast("double"), 6).alias("mi_nats"),
    )


def _mi_sql() -> str:
    qs = [(i, MI_BUCKETS) for i in range(1, MI_BUCKETS)]
    thr = discrete_thresholds_sql("events", "value", qs)
    ex = " + ".join(
        f"CASE WHEN value > t{i} THEN 1 ELSE 0 END"
        for i in range(len(qs))
    )
    return f"""
WITH thr AS (SELECT * FROM {thr}),
cont AS (
  SELECT event_type, 1 + ({ex}) AS vq, COUNT(*) AS nxy
  FROM events CROSS JOIN thr
  GROUP BY 1, 2
),
terms AS (
  SELECT nxy,
    CAST((CAST(nxy AS DOUBLE) / CAST(SUM(nxy) OVER () AS DOUBLE))
      * LN((CAST(nxy AS DOUBLE) / CAST(SUM(nxy) OVER () AS DOUBLE))
           / ((CAST(SUM(nxy) OVER (PARTITION BY event_type) AS DOUBLE)
               / CAST(SUM(nxy) OVER () AS DOUBLE))
              * (CAST(SUM(nxy) OVER (PARTITION BY vq) AS DOUBLE)
                 / CAST(SUM(nxy) OVER () AS DOUBLE))))
      AS DECIMAL(24,12)) AS term
  FROM cont
)
SELECT CAST(SUM(nxy) AS BIGINT) AS n_events,
  ROUND(CAST(SUM(term) AS DOUBLE), 6) AS mi_nats
FROM terms
"""


SPECS = [
    QuerySpec(
        "q_psi_drift",
        q_psi_drift,
        _psi_sql(),
        doc="population stability index, reference-half decile bins",
        tags=("mlops", "drift"),
    ),
    QuerySpec(
        "q_ks_two_sample",
        q_ks_two_sample,
        Q_KS_SQL,
        doc="exact two-sample Kolmogorov-Smirnov statistic",
        tags=("stats",),
    ),
    QuerySpec(
        "a_mutual_information",
        a_mutual_information,
        _mi_sql(),
        doc="MI between event type and value quartile (nats)",
        tags=("stats", "mlops"),
    ),
]
