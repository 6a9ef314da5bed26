"""Fiftieth wave: point-in-polygon containment, revenue-recognition
schedules, and corpus stopword coverage.

Reference parity note: geospatial / finance / text extensions; every
query carries an exact DuckDB oracle.

- **Point-in-polygon** (`j_points_in_polygon`) — ray-casting
  containment of md5-scattered customer points against a fixed
  5-vertex polygon, rolled up per nation.  The polygon is a literal
  broadcast to every task; the crossing test is a per-edge single
  float expression and the inside test is pure crossing-count
  parity (no accumulated float state).
- **Revenue recognition** (`q_revenue_recognition`) — straight-line
  4-month recognition schedule per order in EXACT integer cents
  (floor split, remainder on the final month), rolled up per
  calendar month: the deferred-revenue waterfall every finance
  pipeline needs, with zero float drift by construction.
- **Stopword coverage** (`d_stopword_coverage`) — per language, the
  top-5 corpus tokens and the share of all token occurrences they
  absorb (the corpus-derived stopword screen used before similarity
  joins and TF-IDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import grouped_topk
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table

# fixed survey polygon (lat, lon) — walked counter-clockwise
_POLY = [
    (0.0, -20.0),
    (40.0, 10.0),
    (50.0, 50.0),
    (10.0, 60.0),
    (-20.0, 30.0),
]
_EDGES = list(zip(_POLY, _POLY[1:] + _POLY[:1]))


# ------------------------------------------------------------------ #
# j_points_in_polygon
# ------------------------------------------------------------------ #


def _md5_uniform(prefix: str, key) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), key.cast("string"))), 1, 13
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**52))
    )


def j_points_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers inside the survey polygon per nation (ray casting
    over md5-scattered points)."""
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        "c_nationkey",
        (_md5_uniform("lat:", F.col("c_custkey")) * 170.0 - 85.0).alias(
            "lat"
        ),
        (_md5_uniform("lon:", F.col("c_custkey")) * 360.0 - 180.0).alias(
            "lon"
        ),
    )
    y, x = F.col("lat"), F.col("lon")
    crossings = None
    for (y1, x1), (y2, x2) in _EDGES:
        cond = (
            ((F.lit(y1) > y) != (F.lit(y2) > y))
            & (
                x
                < (F.lit(x2) - F.lit(x1))
                * (y - F.lit(y1))
                / (F.lit(y2) - F.lit(y1))
                + F.lit(x1)
            )
        ).cast("int")
        crossings = cond if crossings is None else crossings + cond
    inside = (crossings % 2 == 1).cast("long")
    return (
        pts.select("c_nationkey", inside.alias("inside"))
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("inside").alias("n_inside"),
            F.round(
                F.sum("inside").cast("double") / F.count("*"), 6
            ).alias("inside_share"),
        )
        .orderBy("c_nationkey")
    )


def _edge_sql(y: str, x: str) -> str:
    terms = []
    for (y1, x1), (y2, x2) in _EDGES:
        terms.append(
            f"CASE WHEN (({y1} > {y}) <> ({y2} > {y})) AND "
            f"({x} < ({x2} - {x1}) * ({y} - {y1}) / ({y2} - {y1}) + {x1})"
            f" THEN 1 ELSE 0 END"
        )
    return " + ".join(terms)


J_POLY_SQL = f"""
WITH pts AS (
  SELECT c_custkey, c_nationkey,
    CAST(('0x' || substring(md5('lat:' || CAST(c_custkey AS VARCHAR)),
      1, 13)) AS UBIGINT) / 4503599627370496.0 * 170.0 - 85.0 AS lat,
    CAST(('0x' || substring(md5('lon:' || CAST(c_custkey AS VARCHAR)),
      1, 13)) AS UBIGINT) / 4503599627370496.0 * 360.0 - 180.0 AS lon
  FROM customer
),
flagged AS (
  SELECT c_nationkey,
    CASE WHEN ({_edge_sql('lat', 'lon')}) % 2 = 1 THEN 1 ELSE 0 END
      AS inside
  FROM pts
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(inside) AS BIGINT) AS n_inside,
  ROUND(CAST(SUM(inside) AS DOUBLE) / COUNT(*), 6) AS inside_share
FROM flagged GROUP BY c_nationkey ORDER BY c_nationkey
"""


# ------------------------------------------------------------------ #
# q_revenue_recognition
# ------------------------------------------------------------------ #


def q_revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Straight-line 4-month recognition of each order's total in
    exact integer cents; recognized revenue per calendar month."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    base = orders.select(
        F.trunc(F.col("o_orderdate"), "month").alias("m0"), cents
    )
    per = (F.col("cents") - F.col("cents") % 4) / 4
    sched = base.select(
        "m0",
        per.cast("long").alias("per"),
        (F.col("cents") - per.cast("long") * 3).alias("last_amt"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
    ).select(
        F.add_months(F.col("m0"), F.col("k")).alias("month"),
        F.when(F.col("k") < 3, F.col("per"))
        .otherwise(F.col("last_amt"))
        .alias("amt"),
    )
    return (
        sched.groupBy("month")
        .agg(
            (
                F.sum(F.col("amt").cast("decimal(27,0)")).cast("double")
                / 100.0
            ).alias("recognized")
        )
        .orderBy("month")
    )


Q_REVREC_SQL = """
WITH base AS (
  SELECT date_trunc('month', o_orderdate)::DATE AS m0,
    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
sched AS (
  SELECT (m0 + to_months(CAST(k AS INT)))::DATE AS month,
    CASE WHEN k < 3 THEN (cents - cents % 4) // 4
         ELSE cents - ((cents - cents % 4) // 4) * 3 END AS amt
  FROM base CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)
)
SELECT month,
  CAST(SUM(CAST(amt AS DECIMAL(27,0))) AS DOUBLE) / 100.0
    AS recognized
FROM sched GROUP BY month ORDER BY month
"""


# ------------------------------------------------------------------ #
# d_stopword_coverage
# ------------------------------------------------------------------ #


def d_stopword_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per language: the top-5 tokens by occurrence count and the
    share of all occurrences they cover."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    occ = docs.select("lang", F.explode(toks).alias("w"))
    counts = occ.groupBy("lang", "w").agg(F.count("*").alias("c"))
    # r7, window-funnel gate: lang has a fixed taxonomy while the
    # per-language vocabulary rollup is data-scaled, so a plain
    # per-lang window would funnel each language's whole vocabulary
    # through one task; grouped_topk is result-identical (unique
    # (c DESC, w) order)
    ranked = grouped_topk(
        counts,
        ["lang"],
        [F.desc("c"), F.col("w")],
        5,
        salt_key=F.col("w"),
        out="rnk",
    )
    tot = counts.groupBy("lang").agg(F.sum("c").alias("total"))
    top = (
        ranked.filter(F.col("rnk") <= 5)
        .groupBy("lang")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list("w"))
            ).alias("stopwords"),
            F.sum("c").alias("stop_occ"),
        )
    )
    return (
        top.join(tot, "lang")
        .select(
            "lang",
            "stopwords",
            F.col("stop_occ").cast("long").alias("stop_occ"),
            F.col("total").cast("long").alias("total_occ"),
            F.round(
                F.col("stop_occ").cast("double") / F.col("total"), 6
            ).alias("coverage"),
        )
        .orderBy("lang")
    )


D_STOPCOV_SQL = r"""
WITH occ AS (
  SELECT lang, unnest(
    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                x -> x <> '')) AS w
  FROM documents
),
counts AS (
  SELECT lang, w, COUNT(*) AS c FROM occ GROUP BY lang, w
),
ranked AS (
  SELECT lang, w, c, ROW_NUMBER() OVER (PARTITION BY lang
    ORDER BY c DESC, w) AS rnk
  FROM counts
),
tot AS (SELECT lang, SUM(c) AS total FROM counts GROUP BY lang),
top AS (
  SELECT lang,
    array_to_string(list_sort(list(w)), ',') AS stopwords,
    SUM(c) AS stop_occ
  FROM ranked WHERE rnk <= 5 GROUP BY lang
)
SELECT top.lang, stopwords,
  CAST(stop_occ AS BIGINT) AS stop_occ,
  CAST(total AS BIGINT) AS total_occ,
  ROUND(CAST(stop_occ AS DOUBLE) / total, 6) AS coverage
FROM top JOIN tot ON top.lang = tot.lang
ORDER BY top.lang
"""


SPECS = [
    QuerySpec(
        "j_points_in_polygon",
        j_points_in_polygon,
        J_POLY_SQL,
        doc="ray-casting point-in-polygon containment per nation",
        tags=("geo", "join"),
    ),
    QuerySpec(
        "q_revenue_recognition",
        q_revenue_recognition,
        Q_REVREC_SQL,
        doc="4-month straight-line revenue recognition in exact cents",
        tags=("finance",),
    ),
    QuerySpec(
        "d_stopword_coverage",
        d_stopword_coverage,
        D_STOPCOV_SQL,
        doc="per-language top-5 stopword list and occurrence coverage",
        tags=("text",),
    ),
]
