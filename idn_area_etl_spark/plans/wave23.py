"""Twenty-third wave: financial/temporal allocation, geo joins, and
bitmap set arithmetic.

Reference parity note: the reference engine's only numeric surface is
coordinate canonicalization (SURVEY.md §2.8 F4); these are
engine-native capabilities every warehouse workload needs:

- **Max drawdown** (`q_max_drawdown`) — per-user running peak of the
  cumulative value series and the deepest drop from a peak; two
  stacked window frames over one sort, exact decimal cumsums so the
  running series is bit-identical across engines and partitionings.
- **FIFO allocation** (`q_fifo_allocation`) — the classic
  inventory/cost-basis op SQL engines struggle with: match each
  outgoing lot (returnflag 'R') against prior incoming lots
  ('N'/'A') per part in ship order, *without* a sequential loop:
  both sides become cumulative-quantity intervals and a matched lot
  is the overlap of two intervals — an equi-join on partkey plus an
  interval-overlap residual (per-key cardinality is bounded, so the
  blocked join never goes quadratic globally; same shape as
  j_fuzzy_customer_pairs).
- **Nearest-hub geo join** (`j_geo_nearest_hub`) — haversine
  nearest-neighbor against a small hub set: hub side broadcasts,
  per-row argmin over k hubs stays in codegen. Coordinates are
  derived deterministically from keys via a Knuth multiplicative
  hash (pure BIGINT arithmetic → engine-portable; no RNG).  At
  scale with a large hub set this becomes the geohash-prefix
  blocked join (see q_zorder_events for the layout half).
- **Bitmap segment overlap** (`a_bitmap_overlap`) — roaring-style
  distinct-user intersection between event types: users are packed
  into 64-bit chunk bitmaps (`bit_or(shiftleft)` — map-side
  combinable, O(|users|/64) state per type), intersected with
  `bit_and`, counted with `bit_count`.  The oracle computes the
  same answer as a plain distinct-pair self-join — the bitmap plan
  shuffles ~64× less data.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user maximum drawdown of the cumulative event-value series."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col("value").cast("decimal(30,6)")).over(w)
    scored = ev.select(
        "user_id",
        cum.alias("cum"),
        F.max(cum).over(w).alias("peak"),
    )
    dd = (F.col("peak") - F.col("cum")).alias("drawdown")
    return (
        scored.select("user_id", dd)
        .groupBy("user_id")
        .agg(
            F.round(F.max("drawdown").cast("double"), 6).alias(
                "max_drawdown"
            )
        )
        .orderBy("user_id")
    )


Q_DRAWDOWN_SQL = """
WITH series AS (
  SELECT user_id, ts, event_id,
    SUM(CAST(value AS DECIMAL(30,6)))
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS cum
  FROM events
),
peaks AS (
  SELECT user_id, cum,
    MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS peak
  FROM series
)
SELECT user_id,
  ROUND(CAST(MAX(peak - cum) AS DOUBLE), 6) AS max_drawdown
FROM peaks GROUP BY user_id ORDER BY user_id
"""


def q_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO matching of outgoing lots against incoming lots per part.

    Interval formulation: lot i's matched quantity against lot j is
    ``max(0, min(in_hi, out_hi) - max(in_lo, out_lo))`` on the
    cumulative-quantity axis — turning the sequential FIFO walk into
    a per-part blocked interval join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    qty = F.col("l_quantity").cast("decimal(30,6)")
    cum_hi = F.sum(qty).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    incoming = (
        li.filter(F.col("l_returnflag").isin("N", "A"))
        .select(
            "l_partkey",
            qty.alias("q"),
            # whole-cent cost basis via floor: floor of an IEEE
            # double is boundary-free (identical in every engine),
            # unlike ROUND which half-rounds differently on doubles.
            F.floor(
                F.col("l_extendedprice") / F.col("l_quantity") * 100
            ).alias("unit_cents"),
            cum_hi.alias("hi"),
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("hi") - F.col("q")).alias("in_lo"),
            F.col("hi").alias("in_hi"),
            "unit_cents",
        )
    )
    outgoing = (
        li.filter(F.col("l_returnflag") == "R")
        .select(
            "l_partkey",
            qty.alias("q"),
            cum_hi.alias("hi"),
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("hi") - F.col("q")).alias("out_lo"),
            F.col("hi").alias("out_hi"),
        )
    )
    matched = incoming.join(outgoing, "partkey").filter(
        (F.col("in_hi") > F.col("out_lo")) & (F.col("out_hi") > F.col("in_lo"))
    )
    overlap = F.least("in_hi", "out_hi") - F.greatest("in_lo", "out_lo")
    return (
        matched.select(
            "partkey",
            overlap.alias("m"),
            (overlap * F.col("unit_cents")).alias("cost_cents"),
        )
        .groupBy("partkey")
        .agg(
            F.sum("m").cast("double").alias("matched_qty"),
            (
                F.sum("cost_cents").cast("decimal(30,6)")
                * F.lit(Decimal("0.01"))
            )
            .cast("double")
            .alias("matched_cost"),
        )
        .orderBy("partkey")
    )


Q_FIFO_SQL = """
WITH base AS (
  SELECT l_partkey, l_returnflag,
    CAST(l_quantity AS DECIMAL(30,6)) AS q,
    FLOOR(l_extendedprice / l_quantity * 100) AS unit_cents,
    SUM(CAST(l_quantity AS DECIMAL(30,6)))
      OVER (PARTITION BY l_partkey, (l_returnflag = 'R')
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS UNBOUNDED PRECEDING) AS hi
  FROM lineitem
),
incoming AS (
  SELECT l_partkey AS partkey, hi - q AS in_lo, hi AS in_hi, unit_cents
  FROM base WHERE l_returnflag IN ('N', 'A')
),
outgoing AS (
  SELECT l_partkey AS partkey, hi - q AS out_lo, hi AS out_hi
  FROM base WHERE l_returnflag = 'R'
),
matched AS (
  SELECT i.partkey,
    LEAST(in_hi, out_hi) - GREATEST(in_lo, out_lo) AS m,
    (LEAST(in_hi, out_hi) - GREATEST(in_lo, out_lo)) * unit_cents
      AS cost_cents
  FROM incoming i JOIN outgoing o
    ON i.partkey = o.partkey
   AND in_hi > out_lo AND out_hi > in_lo
)
SELECT partkey,
  CAST(SUM(m) AS DOUBLE) AS matched_qty,
  CAST(CAST(SUM(cost_cents) AS DECIMAL(30,6)) * 0.01 AS DOUBLE)
    AS matched_cost
FROM matched GROUP BY partkey ORDER BY partkey
"""


#: Knuth multiplicative constants for derived coordinates.
_KA, _KB = 2654435761, 40503


def _lat(key: Column, mult: int) -> Column:
    return (
        F.pmod(key.cast("long") * mult, F.lit(170_000)).cast("double")
        / 1000.0
        - 85.0
    )


def _lon(key: Column, mult: int) -> Column:
    return (
        F.pmod(key.cast("long") * mult + 7, F.lit(360_000)).cast("double")
        / 1000.0
        - 180.0
    )


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance (km) — pure codegen trig."""
    r = 6371.0
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2.0
    dl = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dp) * F.sin(dp)
        + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    )
    return 2.0 * r * F.asin(F.sqrt(a))


def j_geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each customer to its nearest nation hub by haversine
    distance; report per-hub member count and mean distance."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat(F.col("c_custkey"), _KA).alias("lat"),
        _lon(F.col("c_custkey"), _KA).alias("lon"),
    )
    hubs = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("hub_id"),
        _lat(F.col("n_nationkey") + 1, _KB).alias("hlat"),
        _lon(F.col("n_nationkey") + 1, _KB).alias("hlon"),
    )
    scored = c.crossJoin(F.broadcast(hubs)).select(
        "c_custkey",
        "hub_id",
        F.round(
            haversine_km(
                F.col("lat"), F.col("lon"), F.col("hlat"), F.col("hlon")
            ),
            6,
        ).alias("km"),
    )
    best = (
        scored.groupBy("c_custkey")
        .agg(
            F.min(
                F.struct(F.col("km"), F.col("hub_id").alias("h"))
            ).alias("b")
        )
        .select("c_custkey", F.col("b.h").alias("hub_id"), F.col("b.km").alias("km"))
    )
    return (
        best.groupBy("hub_id")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum(F.col("km").cast("decimal(30,6)")).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("mean_km"),
        )
        .orderBy("hub_id")
    )


J_GEO_SQL = f"""
WITH c AS (
  SELECT c_custkey,
    CAST((c_custkey * {_KA}) % 170000 AS DOUBLE) / 1000.0 - 85.0 AS lat,
    CAST((c_custkey * {_KA} + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0
      AS lon
  FROM customer
),
hubs AS (
  SELECT n_nationkey AS hub_id,
    CAST(((n_nationkey + 1) * {_KB}) % 170000 AS DOUBLE) / 1000.0 - 85.0
      AS hlat,
    CAST(((n_nationkey + 1) * {_KB} + 7) % 360000 AS DOUBLE) / 1000.0
      - 180.0 AS hlon
  FROM nation
),
scored AS (
  SELECT c_custkey, hub_id,
    ROUND(2.0 * 6371.0 * ASIN(SQRT(
      SIN(RADIANS(hlat - lat) / 2.0) * SIN(RADIANS(hlat - lat) / 2.0)
      + COS(RADIANS(lat)) * COS(RADIANS(hlat))
        * SIN(RADIANS(hlon - lon) / 2.0)
        * SIN(RADIANS(hlon - lon) / 2.0))), 6) AS km
  FROM c CROSS JOIN hubs
),
best AS (
  SELECT c_custkey, hub_id, km,
    ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY km, hub_id)
      AS rn
  FROM scored
)
SELECT hub_id, CAST(COUNT(*) AS BIGINT) AS n_customers,
  ROUND(CAST(SUM(CAST(km AS DECIMAL(30,6))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS mean_km
FROM best WHERE rn = 1
GROUP BY hub_id ORDER BY hub_id
"""


def bitmap_chunks(df: DataFrame, type_col: str, id_col: str) -> DataFrame:
    """Pack distinct ids per type into 64-bit chunk bitmaps —
    ``bit_or`` is map-side combinable, so per-type state is
    O(max_id/64) longs regardless of row count."""
    return (
        df.select(
            F.col(type_col).alias("t"),
            (F.col(id_col) / 64).cast("long").alias("chunk"),
            F.expr(f"shiftleft(1L, int(pmod({id_col}, 64)))").alias("bit"),
        )
        .groupBy("t", "chunk")
        .agg(F.bit_or("bit").alias("bm"))
    )


def a_bitmap_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between every pair of event types via
    64-bit chunk bitmaps (bit_and + bit_count)."""
    ev = load_table(spark, sf_dir, "events")
    bm = bitmap_chunks(ev, "event_type", "user_id")
    a = bm.select(
        F.col("t").alias("type_a"), "chunk", F.col("bm").alias("bm_a")
    )
    b = bm.select(
        F.col("t").alias("type_b"), "chunk", F.col("bm").alias("bm_b")
    )
    j = a.join(b, "chunk").filter(F.col("type_a") < F.col("type_b"))
    inter = F.bit_count(F.col("bm_a").bitwiseAND(F.col("bm_b")))
    return (
        j.groupBy("type_a", "type_b")
        .agg(F.sum(inter).alias("n_shared_users"))
        .orderBy("type_a", "type_b")
    )


A_BITMAP_SQL = """
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
  CAST(COUNT(*) AS BIGINT) AS n_shared_users
FROM du a JOIN du b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


SPECS = [
    QuerySpec("q_max_drawdown", q_max_drawdown, Q_DRAWDOWN_SQL,
              doc="per-user max drawdown of cumulative value series",
              tags=("events", "finance")),
    QuerySpec("q_fifo_allocation", q_fifo_allocation, Q_FIFO_SQL,
              doc="FIFO lot matching via cumulative-interval overlap join",
              tags=("finance",)),
    QuerySpec("j_geo_nearest_hub", j_geo_nearest_hub, J_GEO_SQL,
              doc="haversine nearest-hub broadcast geo join",
              tags=("join", "geo")),
    QuerySpec("a_bitmap_overlap", a_bitmap_overlap, A_BITMAP_SQL,
              doc="bitmap-packed distinct-user overlap between event types",
              tags=("sketch",)),
]
