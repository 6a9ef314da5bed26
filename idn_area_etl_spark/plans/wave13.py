"""Thirteenth wave: mergeable sketches + native session windows.

- **HLL sketch merge** — the pre-aggregation architecture for 100 TB:
  per-day Datasketches HLL sketches (`hll_sketch_agg`) merged with
  `hll_union_agg` give the multi-day distinct estimate WITHOUT
  re-touching raw rows.  Sketch bytes are engine-specific, so the
  oracle-checked output emits in-plan booleans (digest_ok pattern):
  merged and direct estimates within 5% of exact, and the two
  estimators within 2% of each other (NOT exactly equal — a streamed
  sketch uses the HIP estimator, a union result the composite
  estimator; they coincide only in sparse mode), alongside the exact
  distinct counts DuckDB re-computes.
- **Native session_window** — Spark's built-in session assignment,
  oracle-checked against the lag/cumsum SQL formulation: proves the
  built-in's merge semantics (gap-strict) equal the classic manual
  sessionization on real data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


def a_hll_merge_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type: merged per-day sketches validated
    in-plan against the direct sketch and the exact count.

    Scale: daily sketches are tiny fixed-size binaries computed with
    map-side combine; the merge is O(days · sketch_size) — the
    incremental-rollup pattern (store sketches, never recount raws).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    # Raw estimates are engine-specific, so the oracle-checked output
    # follows the mm_frame_sample digest_ok pattern: the plan compares
    # them in-plan and emits booleans DuckDB pins TRUE alongside the
    # exact distinct counts it re-computes.  NOTE the merge is NOT
    # estimate-lossless once the sketch leaves sparse mode: a streamed
    # sketch estimates with the HIP estimator, while a union result
    # falls back to the composite estimator over the same registers —
    # at sf0.1 they differ by ~0.4% (discovered converting this spec
    # from rows-only; the earlier "exact equality" claim held at tiny
    # SFs only because sparse mode is exact).  The true invariants:
    # both estimates land in the lgK=12 accuracy envelope (~1.6%
    # stderr; 5% ≈ 3σ) and the two estimators agree within 2%.  All
    # checks are deterministic — the sketch hash is data-fixed.
    # Zero-denominator guard: a group whose user_id values are all NULL
    # has exact_users = 0 AND est_* = 0; the relative-error division
    # would yield NULL and the oracle (which pins TRUE) would fail on a
    # data-shape edge rather than a sketch regression.  Degenerate
    # groups pass iff both quantities are zero.
    def _within(a, b, tol):
        return F.when(b == 0, a == 0).otherwise(F.abs(a - b) / b <= tol)

    return (
        merged.join(direct, "event_type")
        .select(
            "event_type",
            "exact_users",
            _within(
                F.col("est_merged"), F.col("est_direct"), 0.02
            ).alias("estimators_agree_2pct"),
            _within(
                F.col("est_merged"), F.col("exact_users"), 0.05
            ).alias("merged_within_5pct"),
            _within(
                F.col("est_direct"), F.col("exact_users"), 0.05
            ).alias("direct_within_5pct"),
        )
        .orderBy("event_type")
    )


A_HLL_MERGE_SQL = """
SELECT event_type,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  TRUE AS estimators_agree_2pct,
  TRUE AS merged_within_5pct,
  TRUE AS direct_within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions via the built-in session_window (30 min gap).

    session_window.end is last-event-time + gap, so subtracting the
    gap recovers the last event timestamp — making the output directly
    comparable to the manual lag/cumsum sessionization the oracle runs.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    return sess.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        (F.col("w.end") - F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
        "n_events",
    )  # unsorted: presentation order is a sink concern


Q_SESSION_WINDOW_SQL = """
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
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
  COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


SPECS = [
    QuerySpec("a_hll_merge_daily", a_hll_merge_daily, A_HLL_MERGE_SQL,
              doc="mergeable HLL sketches: lossless-merge + 5%-error "
                  "booleans vs exact distinct (digest_ok pattern)",
              tags=("stats",)),
    QuerySpec("q_session_window_native", q_session_window_native,
              Q_SESSION_WINDOW_SQL,
              doc="built-in session_window vs manual lag/cumsum oracle",
              tags=("window", "events")),
]
