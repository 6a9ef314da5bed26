"""Seventh wave: weighted sampling, quantile sketches, and Z-order
layout keys — the last curation/layout primitives.

- **Weighted sampling** (Efraimidis–Spirakis exponential race): each
  row gets key ``-ln(u)/w`` with ``u`` derived from a salted md5 —
  not an RNG — so membership is deterministic and partition-invariant
  like the wave-5 Bernoulli sampler; the k smallest keys are an exact
  weighted-without-replacement sample.  Fully SQL-expressible →
  DuckDB oracle.
- **Quantile sketch**: ``approx_percentile`` (Greenwald-Khanna) —
  mergeable, bounded-memory quantiles for 100 TB; sketch internals
  differ per engine so the oracle checks in-plan rank-error BOUND
  booleans plus the DISCRETE median (the stored element at rank
  ⌈n/2⌉ — never a cross-engine float-interpolated percentile; see
  ``a_quantile_sketch``).
- **Z-order keys** (`sinks.zvalue`): bit-interleaved 2-D clustering
  keys; the query ranks events by z-key to prove Spark and a
  bit-ops SQL replica agree bit-for-bit.  The layout use is
  ``write_partitioned_parquet(cluster_by=[zkey])`` — multi-column
  data skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import global_running_multi
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sinks import zvalue, zvalue_sql
from idn_area_etl_spark.sources.tables import load_table

#: 2^52 — 13 hex chars of md5 give a 52-bit integer, exactly
#: representable in a double, so u = (v + 0.5) / 2^52 ∈ (0, 1).
_TWO_52 = float(1 << 52)


def s_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 weighted sample of documents, weight = n_chars.

    Scale: the key is a row-local expression (hash → uniform →
    exponential race), so the only distributed work is a top-k —
    per-partition partial top-k then one O(k) merge, never a full
    sort.  Longer documents win proportionally to length, and the
    selection is reproducible on any cluster layout.
    """
    docs = load_table(spark, sf_dir, "documents")
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit("wsample:"), F.col("doc_id").cast("string"))), 1, 13),
        16,
        10,
    ).cast("double")
    u = (v + F.lit(0.5)) / F.lit(_TWO_52)
    key = -F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(key, 6).alias("race_key"),
        )
        .orderBy("race_key", "doc_id")
        .limit(50)
    )


S_WEIGHTED_SAMPLE_SQL = """
WITH keyed AS (
  -- the inner CAST AS DOUBLE matters: DuckDB evaluates UBIGINT + 0.5
  -- in DECIMAL arithmetic, which can land 1 ulp off Spark's IEEE
  -- double path (measured on 78/500 hash values in the e_isotonic
  -- oracle work) — a latent boundary flake for the 6-dp rounding
  SELECT doc_id, lang, n_chars,
    -ln((CAST(CAST(('0x' || substring(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 13))
              AS UBIGINT) AS DOUBLE) + 0.5) / 4503599627370496.0) / n_chars AS k
  FROM documents
)
SELECT doc_id, lang, n_chars, ROUND(k, 6) AS race_key
FROM keyed
ORDER BY k, doc_id
LIMIT 50
"""


def a_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna quantile sketch of extended price per return
    flag, validated in-plan against the exact percentiles.

    Scale: the sketch is bounded-memory and mergeable (map-side
    partial), replacing the full sort exact percentiles need.  The raw
    estimate is engine-specific, so the oracle-checked output follows
    the ``mm_frame_sample`` ``digest_ok`` pattern: the plan itself
    compares each estimate to the exact percentiles at rank ±5/accuracy
    (5× the GK guarantee of 1/accuracy rank error, merge-order-proof)
    and emits within-bound BOOLEANS plus the exact median — DuckDB pins
    the exact median and asserts the booleans are all TRUE.

    The oracle-compared median is the DISCRETE one — the stored
    ``l_extendedprice`` at rank ⌈n/2⌉ per flag — never an interpolated
    percentile: Spark ``percentile`` and DuckDB ``quantile_cont`` both
    float-interpolate the even-count median with DIFFERENT formulas
    (``lo+(hi-lo)*f`` vs ``lo*(1-f)+hi*f``), so a 1-ulp engine-version
    divergence near a rounding boundary can flip the last digit no
    matter how the result is rescaled — exactly the r6 driver red row.
    A stored element is bit-identical in both engines with zero
    arithmetic between them.  Rank selection is fully distributed: the
    per-(flag, price) rollup gets global running counts from
    ``ranks.global_running_multi`` (range shuffle, no single-task
    window over data-scaled rows — the distinct-price rollup is
    data-scaled at 100 TB), and the only plain window runs over the
    3-row per-flag total frame (bounded by the flag domain).
    """
    li = load_table(spark, sf_dir, "lineitem")
    acc = 10_000
    slack = 5.0 / acc  # 5× the guaranteed rank error, layout-proof
    agg = li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice", F.lit(0.5), F.lit(acc)
        ).alias("ap50"),
        F.approx_percentile(
            "l_extendedprice", F.lit(0.99), F.lit(acc)
        ).alias("ap99"),
        F.expr(f"percentile(l_extendedprice, {0.5 - slack})").alias("lo50"),
        F.expr(f"percentile(l_extendedprice, {0.5 + slack})").alias("hi50"),
        F.expr(f"percentile(l_extendedprice, {0.99 - slack})").alias("lo99"),
        F.expr(f"percentile(l_extendedprice, {min(1.0, 0.99 + slack)})").alias(
            "hi99"
        ),
    )
    # discrete median: distinct-value rollup -> global running counts
    # over (flag, price) -> pick the value whose cumulative span covers
    # the per-flag target rank prior + ceil(n/2)
    rollup = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count("*").alias("cnt")
    )
    run = global_running_multi(
        rollup,
        [F.col("l_returnflag"), F.col("l_extendedprice")],
        {"c": F.col("cnt")},
    )
    wflag = Window.orderBy("l_returnflag").rowsBetween(
        Window.unboundedPreceding, -1
    )
    targets = (
        rollup.groupBy("l_returnflag")
        .agg(F.sum("cnt").alias("n"))
        .select(
            "l_returnflag",
            (
                F.coalesce(F.sum("n").over(wflag), F.lit(0))
                + F.expr("(n + 1) div 2")
            ).alias("target_rank"),
        )
    )
    median = (
        run.join(F.broadcast(targets), "l_returnflag")
        .filter(
            (F.col("cum_c") - F.col("cnt") < F.col("target_rank"))
            & (F.col("target_rank") <= F.col("cum_c"))
        )
        .select("l_returnflag", F.col("l_extendedprice").alias("exact_p50"))
    )
    return agg.join(median, "l_returnflag").select(
        "l_returnflag",
        "exact_p50",
        (
            (F.col("ap50") >= F.col("lo50")) & (F.col("ap50") <= F.col("hi50"))
        ).alias("p50_in_bounds"),
        (
            (F.col("ap99") >= F.col("lo99")) & (F.col("ap99") <= F.col("hi99"))
        ).alias("p99_in_bounds"),
    ).orderBy("l_returnflag")


A_QUANTILE_SKETCH_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
    row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice) AS rn,
    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
  l_extendedprice AS exact_p50,
  TRUE AS p50_in_bounds,
  TRUE AS p99_in_bounds
FROM ranked
WHERE rn = (n + 1) // 2
ORDER BY l_returnflag
"""


def q_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order keys over (value-bucket, hour-of-stream): the 100
    lowest-z events — i.e. the 2-D-smallest corner of the cube.

    Proves the layout key (`sinks.zvalue`) is engine-portable: the
    oracle computes the identical interleave with SQL bit ops.
    """
    ev = load_table(spark, sf_dir, "events")
    x = F.floor(F.col("value")).cast("long")  # value ∈ [0, ~350)
    y = F.floor(
        (F.unix_timestamp("ts") - F.lit(1_704_067_200)) / 3600
    ).cast("long")  # hours since 2024-01-01
    return (
        ev.select(
            "event_id",
            x.alias("x_bucket"),
            y.alias("y_bucket"),
            zvalue(x, y, bits=10).alias("zkey"),
        )
        .orderBy("zkey", "event_id")
        .limit(100)
    )


Q_ZORDER_SQL = f"""
WITH buckets AS (
  SELECT event_id,
    CAST(floor(value) AS BIGINT) AS x_bucket,
    CAST(floor((epoch(ts) - 1704067200) / 3600) AS BIGINT) AS y_bucket
  FROM events
)
SELECT event_id, x_bucket, y_bucket,
  {zvalue_sql('x_bucket', 'y_bucket', bits=10)} AS zkey
FROM buckets
ORDER BY zkey, event_id
LIMIT 100
"""


SPECS = [
    QuerySpec("s_weighted_sample_docs", s_weighted_sample_docs,
              S_WEIGHTED_SAMPLE_SQL,
              doc="deterministic weighted (length-proportional) sample",
              tags=("sampling",)),
    QuerySpec("a_quantile_sketch", a_quantile_sketch, A_QUANTILE_SKETCH_SQL,
              doc="GK quantile sketch: in-plan rank-error bound check vs "
                  "exact percentiles (digest_ok pattern)",
              tags=("stats",)),
    QuerySpec("q_zorder_events", q_zorder_events, Q_ZORDER_SQL,
              doc="Z-order clustering keys (bit-interleave parity)",
              tags=("layout",)),
]
