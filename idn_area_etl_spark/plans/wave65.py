"""Sixty-fifth wave: offline recommender evaluation and facility-
location subset selection.

Reference parity note: recsys-eval + submodular data-selection
extensions.

- **Rec MRR / hit rate** (`q_rec_mrr_hitrate`, oracle) — the offline
  evaluation harness: co-occurrence recommendations trained on the
  FIRST-half orders (by order key parity: even keys train, odd keys
  test), evaluated against held-out test co-purchases — mean
  reciprocal rank of the first test hit and hit-rate@5 over focus
  parts that appear in both splits.  The temporal-split discipline
  every production recsys eval uses, as one declarative plan.
- **Facility location** (`s_facility_location`, rows-only) — greedy
  submodular selection of 5 representative vectors from the first
  60 embeddings; each greedy step is one distributed marginal-gain
  pass (operators/facility.py).  Exact greedy pinned against a
  pure-Python reference in tests/test_facility.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.facility import facility_location_select
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


# ------------------------------------------------------------------ #
# q_rec_mrr_hitrate
# ------------------------------------------------------------------ #


def q_rec_mrr_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train co-occurrence recs on even-key orders, evaluate MRR and
    hit-rate@5 against odd-key test co-purchases (focus p1 < 50)."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    train = op.filter(F.col("l_orderkey") % 2 == 0)
    test = op.filter(F.col("l_orderkey") % 2 == 1)
    ta = train.filter(F.col("l_partkey") < 50).select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1")
    )
    tb = train.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2")
    )
    recs = (
        ta.join(tb, "ok")
        .filter(F.col("p1") != F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("co"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("p1").orderBy(
                    F.desc("co"), "p2"
                )
            ),
        )
        .filter(F.col("rnk") <= 5)
    )
    ea = test.filter(F.col("l_partkey") < 50).select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1")
    )
    eb = test.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2")
    )
    truth = (
        ea.join(eb, "ok")
        .filter(F.col("p1") != F.col("p2"))
        .select("p1", "p2")
        .distinct()
    )
    hits = recs.join(truth, ["p1", "p2"]).groupBy("p1").agg(
        F.min("rnk").alias("first_hit")
    )
    evaluated = (
        recs.select("p1")
        .distinct()
        .join(truth.select("p1").distinct(), "p1")
        .join(hits, "p1", "left")
    )
    return evaluated.agg(
        F.count("*").cast("long").alias("n_evaluated"),
        F.sum(F.col("first_hit").isNotNull().cast("long"))
        .cast("long")
        .alias("n_hit"),
        F.round(
            (
                F.sum(
                    F.coalesce(
                        (1.0 / F.col("first_hit")).cast("decimal(20,12)"),
                        F.lit(0).cast("decimal(20,12)"),
                    )
                )
                / F.count("*")
            ).cast("double"),
            6,
        ).alias("mrr"),
        F.round(
            F.sum(F.col("first_hit").isNotNull().cast("long")).cast(
                "double"
            )
            / F.count("*"),
            6,
        ).alias("hit_rate_at_5"),
    )


Q_MRR_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
train AS (SELECT * FROM op WHERE l_orderkey % 2 = 0),
test AS (SELECT * FROM op WHERE l_orderkey % 2 = 1),
recs AS (
  SELECT p1, p2, rnk FROM (
    SELECT a.l_partkey AS p1, b.l_partkey AS p2,
      ROW_NUMBER() OVER (PARTITION BY a.l_partkey
        ORDER BY COUNT(*) DESC, b.l_partkey) AS rnk
    FROM train a JOIN train b
      ON a.l_orderkey = b.l_orderkey
     AND a.l_partkey <> b.l_partkey
    WHERE a.l_partkey < 50
    GROUP BY a.l_partkey, b.l_partkey
  ) WHERE rnk <= 5
),
truth AS (
  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
  FROM test a JOIN test b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  WHERE a.l_partkey < 50
),
hits AS (
  SELECT p1, MIN(rnk) AS first_hit
  FROM recs JOIN truth USING (p1, p2)
  GROUP BY p1
),
evaluated AS (
  SELECT r.p1, first_hit
  FROM (SELECT DISTINCT p1 FROM recs) r
  JOIN (SELECT DISTINCT p1 FROM truth) t USING (p1)
  LEFT JOIN hits USING (p1)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_evaluated,
  CAST(SUM(CASE WHEN first_hit IS NOT NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS n_hit,
  ROUND(CAST(SUM(COALESCE(CAST(1.0 / first_hit AS DECIMAL(20,12)),
                          CAST(0 AS DECIMAL(20,12))))
             / COUNT(*) AS DOUBLE), 6) AS mrr,
  ROUND(CAST(SUM(CASE WHEN first_hit IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 6) AS hit_rate_at_5
FROM evaluated
"""


# ------------------------------------------------------------------ #
# s_facility_location
# ------------------------------------------------------------------ #


def s_facility_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy facility-location pick of 5 representatives from the
    first 60 embeddings (rows-only; pytest-certified)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 60
    )
    return facility_location_select(spark, emb, k=5)


SPECS = [
    QuerySpec(
        "q_rec_mrr_hitrate",
        q_rec_mrr_hitrate,
        Q_MRR_SQL,
        doc="temporal-split co-occurrence rec eval: MRR + hit-rate@5",
        tags=("recommender", "eval"),
    ),
    QuerySpec(
        "s_facility_location",
        s_facility_location,
        None,  # greedy argmax chain not SQL-expressible
        doc="greedy facility-location subset selection (k=5)",
        tags=("dataset-prep", "sampling", "embedding"),
    ),
]
