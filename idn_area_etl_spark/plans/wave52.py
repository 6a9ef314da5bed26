"""Fifty-second wave: Poisson bootstrap and activity streaks.

Reference parity note: scalable-statistics + engagement extensions;
every query carries an exact DuckDB oracle.

- **Poisson bootstrap** (`a_poisson_bootstrap_ci`) — the bootstrap
  that actually scales: instead of multinomial resampling (which
  needs global coordination), every (event, replicate) pair draws
  an independent Poisson(1) weight — here deterministically, by
  inverting the Poisson CDF on an md5 uniform, so the whole
  procedure is reproducible and oracle-checkable.  24 replicates of
  the mean event value in one exploded aggregation; the CI is the
  [2nd smallest, 2nd largest] replicate mean (exact order
  statistics — no percentile-interpolation ambiguity between
  engines).
- **Longest streaks** (`q_longest_streaks`) — classic
  gaps-and-islands: per user the longest run of consecutive active
  days (day-number minus row-number constancy), reported as a
  distribution of streak lengths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table

_B = 24  # bootstrap replicates

#: cumulative Poisson(1) CDF thresholds for k = 0..7 (k=8 tail cap)
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
)


# ------------------------------------------------------------------ #
# a_poisson_bootstrap_ci
# ------------------------------------------------------------------ #


def a_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-replicate Poisson-bootstrap CI for the mean event value."""
    ev = load_table(spark, sf_dir, "events")
    reps = ev.select(
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(1), F.lit(_B))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**52))
    )
    w = None
    for t in _POIS_CDF:
        step = (u >= F.lit(t)).cast("long")
        w = step if w is None else w + step
    weighted = reps.select("b", w.alias("w"), "value")
    per_rep = weighted.groupBy("b").agg(
        F.sum("w").alias("wsum"),
        F.sum((F.col("w") * F.col("value")).cast("decimal(38,10)")).alias(
            "wx"
        ),
    ).select(
        "b",
        (F.col("wx") / F.col("wsum")).cast("double").alias("rep_mean"),
    )
    ranked = per_rep.select(
        "rep_mean",
        F.row_number().over(Window.orderBy("rep_mean", "b")).alias("lo_r"),
        F.row_number()
        .over(Window.orderBy(F.desc("rep_mean"), F.desc("b")))
        .alias("hi_r"),
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_reps"),
        F.round(
            (
                F.sum(F.col("rep_mean").cast("decimal(27,12)"))
                / F.count("*")
            ).cast("double"),
            6,
        ).alias("boot_mean"),
        F.round(
            F.max(F.when(F.col("lo_r") == 2, F.col("rep_mean"))), 6
        ).alias("ci_lo"),
        F.round(
            F.max(F.when(F.col("hi_r") == 2, F.col("rep_mean"))), 6
        ).alias("ci_hi"),
    )


def _pois_sql() -> str:
    steps = " + ".join(
        f"CASE WHEN u >= {t!r} THEN 1 ELSE 0 END" for t in _POIS_CDF
    )
    return f"""
WITH reps AS (
  SELECT event_id, value, unnest(generate_series(1, {_B})) AS b
  FROM events
),
uni AS (
  SELECT b, value,
    CAST(('0x' || substring(md5('boot:' || CAST(b AS VARCHAR) || ':'
      || CAST(event_id AS VARCHAR)), 1, 13)) AS UBIGINT)
      / 4503599627370496.0 AS u
  FROM reps
),
weighted AS (SELECT b, ({steps}) AS w, value FROM uni),
per_rep AS (
  SELECT b, CAST(SUM(CAST(w * value AS DECIMAL(38,10))) / SUM(w)
                 AS DOUBLE) AS rep_mean
  FROM weighted GROUP BY b
),
ranked AS (
  SELECT rep_mean,
    ROW_NUMBER() OVER (ORDER BY rep_mean, b) AS lo_r,
    ROW_NUMBER() OVER (ORDER BY rep_mean DESC, b DESC) AS hi_r
  FROM per_rep
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
  ROUND(CAST(SUM(CAST(rep_mean AS DECIMAL(27,12))) / COUNT(*)
             AS DOUBLE), 6) AS boot_mean,
  ROUND(MAX(CASE WHEN lo_r = 2 THEN rep_mean END), 6) AS ci_lo,
  ROUND(MAX(CASE WHEN hi_r = 2 THEN rep_mean END), 6) AS ci_hi
FROM ranked
"""


# ------------------------------------------------------------------ #
# q_longest_streaks
# ------------------------------------------------------------------ #


def q_longest_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of each user's longest consecutive-active-day
    streak."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = ud.select(
        "user_id",
        (F.col("d") - F.row_number().over(w)).alias("grp"),
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count("*").alias("len")
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("len").alias("longest")
    )
    return (
        longest.groupBy("longest")
        .agg(F.count("*").alias("n_users"))
        .orderBy("longest")
    )


Q_STREAK_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
  FROM events
),
grouped AS (
  SELECT user_id,
    d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM ud
),
streaks AS (
  SELECT user_id, grp, COUNT(*) AS len
  FROM grouped GROUP BY user_id, grp
),
longest AS (
  SELECT user_id, MAX(len) AS longest FROM streaks GROUP BY user_id
)
SELECT longest, CAST(COUNT(*) AS BIGINT) AS n_users
FROM longest GROUP BY longest ORDER BY longest
"""


SPECS = [
    QuerySpec(
        "a_poisson_bootstrap_ci",
        a_poisson_bootstrap_ci,
        _pois_sql(),
        doc="deterministic 24-replicate Poisson-bootstrap CI of mean value",
        tags=("stats", "experimentation"),
    ),
    QuerySpec(
        "q_longest_streaks",
        q_longest_streaks,
        Q_STREAK_SQL,
        doc="longest consecutive-active-day streak distribution",
        tags=("events", "engagement"),
    ),
]
