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
  differ per engine so the driver records rows-only and pytest
  certifies the estimates against exact percentiles.
- **Z-order keys** (`sinks.zvalue`): bit-interleaved 2-D clustering
  keys; the query ranks events by z-key to prove Spark and a
  bit-ops SQL replica agree bit-for-bit.  The layout use is
  ``write_partitioned_parquet(cluster_by=[zkey])`` — multi-column
  data skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
  SELECT doc_id, lang, n_chars,
    -ln((CAST(('0x' || substring(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 13))
              AS UBIGINT) + 0.5) / 4503599627370496.0) / n_chars AS k
  FROM documents
)
SELECT doc_id, lang, n_chars, ROUND(k, 6) AS race_key
FROM keyed
ORDER BY k, doc_id
LIMIT 50
"""


def a_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna quantile sketch of extended price per return
    flag, alongside the exact median.

    Scale: the sketch is bounded-memory and mergeable (map-side
    partial), replacing the full sort exact percentiles need.  Sketch
    internals differ per engine → rows-only driver check; pytest
    certifies each estimate against the exact percentile within the
    sketch's accuracy bound.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx_p50"),
            F.approx_percentile("l_extendedprice", F.lit(0.99), F.lit(10000)).alias("approx_p99"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        )
        .orderBy("l_returnflag")
    )


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
    QuerySpec("a_quantile_sketch", a_quantile_sketch, None,
              doc="GK quantile sketch vs exact median (rows-only)",
              tags=("stats",)),
    QuerySpec("q_zorder_events", q_zorder_events, Q_ZORDER_SQL,
              doc="Z-order clustering keys (bit-interleave parity)",
              tags=("layout",)),
]
