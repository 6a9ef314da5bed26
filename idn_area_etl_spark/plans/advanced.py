"""Advanced surface: hard-function oracle parity + temporal joins +
extra engine-native analytics.

- ``rf_fix_wrapped`` / ``rf_coordinate``: the two gnarliest reference
  functions (F2 utils.py:41-65, F4 utils.py:189-225) run as native
  Spark expressions against full SQL re-implementations in DuckDB
  (string-accumulator list_reduce fold; regexp_extract_all scan) —
  cross-engine proof of the exact semantics.
- ``j_asof_*`` / ``j_range_*``: as-of and range joins (operators
  Spark lacks natively; operators/joins.py) checked against DuckDB's
  built-in ASOF JOIN and an inequality join.
- assorted engine-native analytics: exact percentiles, CUBE, ordered
  string aggregation, arg-max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.functions.cleaning import fix_wrapped_name, format_coordinate
from idn_area_etl_spark.operators.joins import asof_join, range_join_within
from idn_area_etl_spark.operators.ranks import grouped_running_multi
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# F2 fix_wrapped_name parity (fold semantics incl. cascading merges)
# --------------------------------------------------------------------------

FIX_WRAPPED_FIXTURE = [
    "Bakongan",
    "Bakongan  ",
    "Pulau Panjangtengah\nan",
    "Pulau Panjangtengah\nAN",
    "Pulau\nan",
    "Pulau Panjangtengah\nabcd",
    "Pulau Panjangtenga-\nan",
    "Pulau\n\nBesar",
    "Pulau Besar\n   ",
    "Pulau Panjangtengah\nan\nOther",
    "Pulau Panjangtengahxy\nab\ncd",   # cascading double merge
    "",
]


def rf_fix_wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(FIX_WRAPPED_FIXTURE)], "id int, raw string"
    )
    return df.select(
        "id", fix_wrapped_name(F.col("raw")).alias("fixed")
    ).orderBy("id")


def _sql_str(s: str) -> str:
    return "E'" + s.replace("'", "''").replace("\n", "\\n") + "'"


_FIX_WRAPPED_VALUES = ", ".join(
    f"({i}, {_sql_str(s)})" for i, s in enumerate(FIX_WRAPPED_FIXTURE)
)

RF_FIX_WRAPPED_SQL = f"""
WITH raw(id, raw) AS (VALUES {_FIX_WRAPPED_VALUES}),
lines AS (
  SELECT id,
    list_filter(
      list_transform(string_split(raw, chr(10)),
                     x -> regexp_replace(x, '\\s+$', '')),
      x -> x <> '') AS l
  FROM raw
)
SELECT id,
  CASE WHEN len(l) = 0 THEN ''
       ELSE list_reduce(l, (acc, x) ->
         CASE WHEN length(regexp_extract(acc, '([^\\n]*)$', 1)) >= 16
               AND length(x) <= 3
               AND right(regexp_extract(acc, '([^\\n]*)$', 1), 1) NOT IN (' ', '-')
               AND regexp_matches(substr(x, 1, 1), '^\\p{{Ll}}$')
         THEN acc || x
         ELSE acc || chr(10) || x END)
  END AS fixed
FROM lines
ORDER BY id
"""

# --------------------------------------------------------------------------
# F4 format_coordinate parity (full scan/parse/canonicalize replica)
# --------------------------------------------------------------------------

COORDINATE_FIXTURE = [
    "03°19'03.44\" N 097°07'41.73\" E",
    "03°19'03.44\" U 097°07'41.73\" T",
    "03°19'03.44\" LU 097°07'41.73\" BT",
    "03° 31'33.49\"  U   125° 39'37.53\"   T",
    "03°19'03.4\" S 097°07'41.7\" B",
    '01°18\'47.00"" U 124°30\'46.00"" T',
    "03°19'03.444\" N 097°07'41.735\" E",
    "03°19'03.44 N 097°07'41.73 E",
    "03°19’03.44″ LU 097°07’41.73″ BT",
    "03°19'03.44\" N 097°07'41.73\" E 00°00'00\" N",
    "097°07'41.73\" E 03°19'03.44\" N 000°00'00\" E",
    "N 03°19'03.44\" E 097°07'41.73\"",
    "N 03 19 03.4 E 097 07 41.7",
    "03 19 03.4   N   097 07 41.7   E",
    "U T",
    "abc",
    "Invalid coordinate",
    "",
    "   ",
]


def rf_coordinate(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(COORDINATE_FIXTURE)], "id int, raw string"
    )
    return df.select(
        "id", format_coordinate(F.col("raw")).alias("coordinate")
    ).orderBy("id")


_COORD_VALUES = ", ".join(
    f"({i}, {_sql_str(s)})" for i, s in enumerate(COORDINATE_FIXTURE)
)

# RE2 equivalent of the Java pattern in functions/cleaning.py
_COORD_PAT_SQL = (
    "'(?:([NSEW])\\s*)?(\\d{1,3})\\s*°\\s*(\\d{1,2})\\s*''\\s*"
    "(\\d{1,2}(?:\\.\\d+)?)\\s*\"?\\s*([NSEW])?'"
)

RF_COORDINATE_SQL = f"""
WITH raw(id, raw) AS (VALUES {_COORD_VALUES}),
quoted AS (
  SELECT id,
    regexp_replace(regexp_replace(
      replace(replace(replace(replace(replace(replace(raw,
        '’', ''''), '‘', ''''), '′', ''''),
        '“', '"'), '”', '"'), '″', '"'),
      '"{{2,}}', '"', 'g'), '''{{2,}}', '''', 'g') AS s
  FROM raw
),
mapped AS (
  SELECT id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    regexp_replace(regexp_replace(regexp_replace(s,
      '(?i)\\bLU\\b', 'N', 'g'), '(?i)\\bLS\\b', 'S', 'g'),
      '(?i)\\bBT\\b', 'E', 'g'), '(?i)\\bBB\\b', 'W', 'g'),
      '(?i)\\bU\\b', 'N', 'g'), '(?i)\\bT\\b', 'E', 'g'),
      '(?i)\\bB\\b', 'W', 'g'), '(?i)\\bN\\b', 'N', 'g'),
      '(?i)\\bS\\b', 'S', 'g'), '(?i)\\bE\\b', 'E', 'g'),
      '(?i)\\bW\\b', 'W', 'g') AS s
  FROM quoted
),
norm AS (
  SELECT id, trim(regexp_replace(s, '\\s+', ' ', 'g')) AS s FROM mapped
),
scanned AS (
  SELECT id, s,
    [m for m in regexp_extract_all(s, {_COORD_PAT_SQL})
       IF COALESCE(NULLIF(regexp_extract(m, {_COORD_PAT_SQL}, 1), ''),
                   NULLIF(regexp_extract(m, {_COORD_PAT_SQL}, 5), ''))
          IN ('N', 'S')][1] AS lat_m,
    [m for m in regexp_extract_all(s, {_COORD_PAT_SQL})
       IF COALESCE(NULLIF(regexp_extract(m, {_COORD_PAT_SQL}, 1), ''),
                   NULLIF(regexp_extract(m, {_COORD_PAT_SQL}, 5), ''))
          IN ('E', 'W')][1] AS lon_m
  FROM norm
)
SELECT id,
  CASE WHEN lat_m IS NOT NULL AND lon_m IS NOT NULL THEN
    regexp_extract(lat_m, {_COORD_PAT_SQL}, 2) || '°' ||
    regexp_extract(lat_m, {_COORD_PAT_SQL}, 3) || '''' ||
    regexp_extract(regexp_extract(lat_m, {_COORD_PAT_SQL}, 4), '^(\\d+)', 1)
      || '.' ||
    substr(regexp_extract(regexp_extract(lat_m, {_COORD_PAT_SQL}, 4),
                          '\\.(\\d+)$', 1) || '00', 1, 2) || '" ' ||
    COALESCE(NULLIF(regexp_extract(lat_m, {_COORD_PAT_SQL}, 1), ''),
             NULLIF(regexp_extract(lat_m, {_COORD_PAT_SQL}, 5), '')) ||
    ' ' ||
    regexp_extract(lon_m, {_COORD_PAT_SQL}, 2) || '°' ||
    regexp_extract(lon_m, {_COORD_PAT_SQL}, 3) || '''' ||
    regexp_extract(regexp_extract(lon_m, {_COORD_PAT_SQL}, 4), '^(\\d+)', 1)
      || '.' ||
    substr(regexp_extract(regexp_extract(lon_m, {_COORD_PAT_SQL}, 4),
                          '\\.(\\d+)$', 1) || '00', 1, 2) || '" ' ||
    COALESCE(NULLIF(regexp_extract(lon_m, {_COORD_PAT_SQL}, 1), ''),
             NULLIF(regexp_extract(lon_m, {_COORD_PAT_SQL}, 5), ''))
  ELSE s END AS coordinate
FROM scanned
ORDER BY id
"""

# --------------------------------------------------------------------------
# Temporal joins
# --------------------------------------------------------------------------


def j_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase paired with the user's most recent prior (or
    simultaneous) click, via the union+last-value as-of operator."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_event"), F.col("ts").alias("p_ts")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("c_ts"))
        .agg(F.max("event_id").alias("c_event"))
        .select("user_id", "c_ts", "c_event")
    )
    out = asof_join(
        purchases, clicks, key="user_id", left_ts="p_ts", right_ts="c_ts",
        payload_cols=["c_event", "c_ts"],
    )
    return out.select(
        "user_id", "p_event", "p_ts", "asof_c_event", "asof_c_ts"
    ).orderBy("p_event")


J_ASOF_SQL = """
WITH p AS (
  SELECT user_id, event_id AS p_event, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts AS c_ts, MAX(event_id) AS c_event
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
)
SELECT p.user_id, p_event, p_ts,
  c.c_event AS asof_c_event, c.c_ts AS asof_c_ts
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.p_ts >= c.c_ts
ORDER BY p_event
"""


def j_range_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user count of event pairs within 60 seconds (burst
    detection), via the bucketized range join."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.select("user_id", F.col("event_id").alias("a_event"), F.col("ts").alias("a_ts"))
    b = ev.select("user_id", F.col("event_id").alias("b_event"), F.col("ts").alias("b_ts"))
    pairs = range_join_within(
        a, b, key="user_id", left_ts="a_ts", right_ts="b_ts", max_gap_seconds=60
    ).filter(
        (F.col("a_ts") < F.col("b_ts"))
        | ((F.col("a_ts") == F.col("b_ts")) & (F.col("a_event") < F.col("b_event")))
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("user_id")
    )


J_RANGE_SQL = """
SELECT a.user_id, COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
  AND floor(epoch(b.ts)) - floor(epoch(a.ts)) BETWEEN 0 AND 60
  AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
GROUP BY a.user_id
ORDER BY a.user_id
"""

# --------------------------------------------------------------------------
# Extra engine-native analytics
# --------------------------------------------------------------------------


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority quartiles of order totals — DISCRETE (the stored
    element at rank ⌈q·n⌉), never a cross-engine float-interpolated
    percentile (the r6 `a_quantile_sketch` red-row class: Spark
    `percentile` and DuckDB `quantile_cont` interpolate with different
    formulas, so a 1-ulp engine divergence near a 6-dp boundary can
    flip the compared digit).  A stored double is bit-identical in
    both engines with zero arithmetic between them.

    Scale (r7): o_orderpriority has a 5-value domain, so the rank
    selection runs over the per-(priority, price) rollup's distributed
    running counts (`ranks.grouped_running_multi`) — the old exact
    `percentile` aggregate buffered a fifth of the order totals per
    group; a plain per-priority window would do the same.  Scalar
    quartile columns (not array<double>): the driver's oracle
    canonicalizer hashes cells with pandas, which cannot hash lists.
    """
    orders = load_table(spark, sf_dir, "orders")
    rolled = orders.groupBy("o_orderpriority", "o_totalprice").agg(
        F.count("*").alias("cnt")
    )
    run = grouped_running_multi(
        rolled,
        ["o_orderpriority"],
        [F.col("o_totalprice")],
        {"c": F.col("cnt")},
    )
    lo = F.col("grun_c") - F.col("cnt")  # rows strictly before this value

    def covering(rank):
        return (lo < rank) & (rank <= F.col("grun_c"))

    r25 = F.expr("(gtot_c + 3) div 4")
    r50 = F.expr("(gtot_c + 1) div 2")
    r75 = F.expr("(3 * gtot_c + 3) div 4")
    return (
        run.groupBy("o_orderpriority")
        .agg(
            F.min(F.when(covering(r25), F.col("o_totalprice"))).alias("p25"),
            F.min(F.when(covering(r50), F.col("o_totalprice"))).alias("p50"),
            F.min(F.when(covering(r75), F.col("o_totalprice"))).alias("p75"),
        )
        .orderBy("o_orderpriority")
    )


Q_PERCENTILES_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
    row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice) AS rn,
    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority,
  MIN(CASE WHEN rn = (n + 3) // 4 THEN o_totalprice END) AS p25,
  MIN(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS p50,
  MIN(CASE WHEN rn = (3 * n + 3) // 4 THEN o_totalprice END) AS p75
FROM ranked
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(24,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


Q_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


def q_string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            )
        )
        .orderBy("r_name")
    )


Q_STRING_AGG_SQL = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def q_argmax_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/arg_max with a collision-free sortable key (price padded
    + orderkey) so ties cannot make the result nondeterministic."""
    orders = load_table(spark, sf_dir, "orders")
    ord_key = F.format_string(
        "%018.2f-%012d", F.col("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", ord_key).alias("top_orderkey"),
            F.max(F.col("o_totalprice")).alias("top_price"),
        )
        .orderBy("o_orderpriority")
    )


Q_ARGMAX_SQL = """
SELECT o_orderpriority,
  arg_max(o_orderkey, printf('%018.2f-%012d', o_totalprice, o_orderkey))
    AS top_orderkey,
  MAX(o_totalprice) AS top_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


SPECS = [
    QuerySpec("rf_fix_wrapped", rf_fix_wrapped, RF_FIX_WRAPPED_SQL,
              doc="F2 line-wrap repair fold vs SQL list_reduce replica",
              tags=("refop",)),
    QuerySpec("rf_coordinate", rf_coordinate, RF_COORDINATE_SQL,
              doc="F4 coordinate canonicalization vs full SQL replica",
              tags=("refop",)),
    QuerySpec("j_asof_purchase_click", j_asof_purchase_click, J_ASOF_SQL,
              doc="as-of join vs DuckDB ASOF JOIN", tags=("join",)),
    QuerySpec("j_range_bursts", j_range_bursts, J_RANGE_SQL,
              doc="bucketized range join vs inequality join", tags=("join",)),
    QuerySpec("q_percentiles", q_percentiles, Q_PERCENTILES_SQL,
              doc="exact interpolated quartiles", tags=("agg",)),
    QuerySpec("q_cube_orders", q_cube_orders, Q_CUBE_SQL,
              doc="CUBE grouping sets", tags=("agg",)),
    QuerySpec("q_string_agg_nations", q_string_agg_nations, Q_STRING_AGG_SQL,
              doc="ordered string aggregation", tags=("agg",)),
    QuerySpec("q_argmax_order", q_argmax_order, Q_ARGMAX_SQL,
              doc="deterministic max_by/arg_max", tags=("agg",)),
]
