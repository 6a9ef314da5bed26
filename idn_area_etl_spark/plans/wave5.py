"""Fifth wave: deterministic sampling, sketches, and pipeline
statistics for training-data curation at scale.

- Hash-based sampling (plain + stratified): a stateless per-row
  predicate on ``md5(key)`` — no shuffle, no RNG state, and the same
  rows are selected on 1 executor or 1000 (unlike ``sample()``/
  ``sampleBy()``, whose per-partition RNG changes with partitioning).
  Exactly SQL-expressible, so both queries have full DuckDB oracles.
- Exact correlation: Pearson r derived from exact decimal power sums
  (single-pass, map-side combinable) with one final double formula —
  deterministic under any aggregation order, unlike ``F.corr``'s
  streaming float reduction.
- Funnel: the classic event-ordering analytics shape (stage times via
  conditional MIN per user, then one global conditional count).
- HLL sketch: ``approx_count_distinct`` — constant memory per group at
  any cardinality; certified against exact counts in pytest
  (tests/test_plans_wave5.py) since HLL internals differ per engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


def hash_sample_predicate(key: Column, threshold_hex2: str, salt: str = "sample:") -> Column:
    """Deterministic Bernoulli sample: keep rows whose salted md5's
    first hex byte is below the threshold ('10' → 16/256 = 6.25%).

    Scale: pure row-local predicate — pushes inside the scan stage,
    needs no shuffle, and is reproducible across cluster layouts
    (partition-count changes never alter membership).
    """
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 2) < threshold_hex2


def s_hash_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~6.25% deterministic document sample keyed on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(hash_sample_predicate(F.col("doc_id"), "10"))
        .select("doc_id", "lang", "source", "n_chars")
    )


S_HASH_SAMPLE_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2) < '10'
ORDER BY doc_id
"""


def s_stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified deterministic sample: downsample the
    dominant language ('en' at ~12.5%) while keeping half of every
    minority language — the standard corpus-rebalancing move.

    Same row-local hash predicate as :func:`s_hash_sample_docs`, with a
    per-stratum threshold; still zero shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.when(F.col("lang") == "en", F.lit("20")).otherwise(F.lit("80"))
    hash2 = F.substring(
        F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 2
    )
    return (
        docs.filter(hash2 < threshold)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
        .orderBy("lang")
    )


S_STRATIFIED_SAMPLE_SQL = """
SELECT lang, COUNT(*) AS n_sampled,
  CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2)
      < CASE WHEN lang = 'en' THEN '20' ELSE '80' END
GROUP BY lang
ORDER BY lang
"""


def q_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return
    flag, from exact decimal power sums.

    Scale: one map-side-combinable aggregation (6 decimal sums), one
    O(groups) shuffle, then a single double-precision formula — the
    result is bit-deterministic under any partitioning, which
    ``F.corr`` (streaming float reduction) is not.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")

    def dsum(c: Column, alias: str) -> Column:
        return F.sum(c.cast("decimal(30,6)")).cast("double").alias(alias)

    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum(q, "sq"),
        dsum(p, "sp"),
        dsum(q * q, "sqq"),
        dsum(p * p, "spp"),
        dsum(q * p, "sqp"),
    )
    n = F.col("n").cast("double")
    corr = (n * F.col("sqp") - F.col("sq") * F.col("sp")) / (
        F.sqrt(n * F.col("sqq") - F.col("sq") * F.col("sq"))
        * F.sqrt(n * F.col("spp") - F.col("sp") * F.col("sp"))
    )
    return sums.select(
        "l_returnflag",
        F.col("n"),
        F.round(corr, 6).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


Q_CORR_SQL = """
WITH sums AS (
  SELECT l_returnflag, COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sq,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sp,
    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sqq,
    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS spp,
    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sqp
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  ROUND((CAST(n AS DOUBLE) * sqp - sq * sp) /
    (sqrt(CAST(n AS DOUBLE) * sqq - sq * sq) *
     sqrt(CAST(n AS DOUBLE) * spp - sp * sp)), 6) AS corr_qty_price
FROM sums
ORDER BY l_returnflag
"""


def q_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel view → click → purchase.

    Stage times are conditional MINs per user (one shuffle on
    user_id, map-side combinable); the stage counts are a single
    global conditional aggregation.  Null stage times fail the strict
    ``<`` comparisons, so users skip stages only by actually
    converting in order.
    """
    ev = load_table(spark, sf_dir, "events")

    def stage(evt: str, alias: str) -> Column:
        return F.min(
            F.when(F.col("event_type") == evt, F.col("ts"))
        ).alias(alias)

    per_user = ev.groupBy("user_id").agg(
        stage("view", "t_view"), stage("click", "t_click"),
        stage("purchase", "t_purchase"),
    )
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return per_user.agg(
        F.count("*").alias("n_users"),
        one_if(F.col("t_view").isNotNull()).alias("n_view"),
        one_if(F.col("t_view") < F.col("t_click")).alias("n_view_click"),
        one_if(
            (F.col("t_view") < F.col("t_click"))
            & (F.col("t_click") < F.col("t_purchase"))
        ).alias("n_full_funnel"),
    )


Q_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
  CAST(SUM(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT)
    AS n_view_click,
  CAST(SUM(CASE WHEN t_view < t_click AND t_click < t_purchase
       THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM per_user
"""


def a_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user sketches per event type at two
    accuracy settings, validated in-plan against the exact count.

    Scale: the sketch is O(1) memory per group regardless of
    cardinality and merges associatively — at 100 TB this replaces the
    O(distinct) exact shuffle when a few-percent answer is acceptable.

    Raw estimates are engine-specific, so the oracle-checked output
    follows the digest_ok pattern (like ``a_hll_merge_daily``): the
    plan compares each estimate to the exact count it also computes
    and emits within-bound BOOLEANS DuckDB pins TRUE.  Bounds are 3×
    the configured relative standard deviation (default rsd = 5% →
    15%; rsd = 1% → 3%) — NOT the rsd itself: at sf0.1 the default
    sketch sits 6.7% off (≈1.3σ, normal behavior once the sketch
    leaves the exact sparse regime), which a naive 5% bound would
    flag.  Deterministic: the sketch hash is data-fixed.  The
    zero-denominator guard keeps degenerate all-NULL groups boolean
    (both estimates and the exact count are 0 there).

    PER-SF VERIFICATION OBLIGATION (r7 ADVICE): the 3×rsd bound is
    STATISTICAL, not guaranteed — the sketch is deterministic per
    dataset, so the booleans are stable at a VERIFIED scale factor,
    but at an untested SF a group estimate can legitimately sit beyond
    3σ with no code regression (the default sketch already sits at
    1.3σ at sf0.1).  Before pinning this spec in a correctness window
    at a new SF, re-run both booleans at that SF first (the standard
    rotation-candidate verification).  Verified TRUE at sf0.001,
    sf0.01, and sf0.1 (round 6).
    """
    ev = load_table(spark, sf_dir, "events")

    def _within(a, b, tol):
        return F.when(b == 0, a == 0).otherwise(F.abs(a - b) / b <= tol)

    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("est_default"),
        F.approx_count_distinct("user_id", 0.01).alias("est_precise"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        _within(
            F.col("est_default"), F.col("exact_users"), 0.15
        ).alias("default_within_3rsd"),
        _within(
            F.col("est_precise"), F.col("exact_users"), 0.03
        ).alias("precise_within_3rsd"),
    ).orderBy("event_type")


A_APPROX_DISTINCT_SQL = """
SELECT event_type,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  TRUE AS default_within_3rsd,
  TRUE AS precise_within_3rsd
FROM events
GROUP BY event_type
ORDER BY event_type
"""


SPECS = [
    QuerySpec("s_hash_sample_docs", s_hash_sample_docs, S_HASH_SAMPLE_SQL,
              doc="deterministic md5-keyed Bernoulli sample",
              tags=("sampling",)),
    QuerySpec("s_stratified_sample_docs", s_stratified_sample_docs,
              S_STRATIFIED_SAMPLE_SQL,
              doc="language-stratified deterministic sample",
              tags=("sampling",)),
    QuerySpec("q_corr_qty_price", q_corr_qty_price, Q_CORR_SQL,
              doc="exact-decimal Pearson correlation", tags=("stats",)),
    QuerySpec("q_funnel_users", q_funnel_users, Q_FUNNEL_SQL,
              doc="strict ordered event funnel", tags=("events",)),
    QuerySpec("a_approx_distinct_users", a_approx_distinct_users,
              A_APPROX_DISTINCT_SQL,
              doc="HLL++ distinct sketches at two rsd settings: in-plan "
                  "3-sigma bound checks vs exact (digest_ok pattern)",
              tags=("stats",)),
]
