"""Sixty-eighth wave: runs test, 1-NN leave-one-out accuracy, and
ship lead times.

Reference parity note: randomness testing + embedding-label eval +
fulfillment analytics; every query carries an exact DuckDB oracle.

- **Runs test** (`a_runs_test`) — Wald-Wolfowitz randomness of the
  daily revenue direction: runs of consecutive up/down signs,
  expected runs 2 n1 n2 / (n1+n2) + 1, its variance, and the Z
  score.  Pure integer counting until the closed form.
- **1-NN LOO accuracy** (`e_knn_loo_accuracy`) — leave-one-out
  nearest-neighbor label accuracy over the embeddings (cosine,
  excluding self): the classic representation-quality probe; per
  true label, the share of vectors whose nearest other vector
  agrees.
- **Ship lead time** (`q_ship_lead_time`) — fulfillment analytics:
  days between order date and each line's ship date, exact
  quartiles (percentile_disc — value selection, no interpolation)
  per order priority.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


# ------------------------------------------------------------------ #
# a_runs_test
# ------------------------------------------------------------------ #


def a_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the signs of day-over-day revenue
    changes (zero changes dropped)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).agg(
        F.sum(F.col("value").cast("decimal(27,6)"))
        .cast("double")
        .alias("y")
    )
    w = Window.orderBy("d")
    signs = (
        daily.select(
            "d", (F.col("y") - F.lag("y").over(w)).alias("chg")
        )
        .filter(F.col("chg").isNotNull() & (F.col("chg") != 0))
        .select(
            "d", (F.col("chg") > 0).cast("int").alias("up")
        )
    )
    w2 = Window.orderBy("d")
    runs = signs.select(
        "up",
        (
            F.when(
                F.lag("up").over(w2).isNull()
                | (F.lag("up").over(w2) != F.col("up")),
                1,
            ).otherwise(0)
        ).alias("new_run"),
    )
    agg = runs.agg(
        F.sum("up").alias("n1"),
        F.sum(1 - F.col("up")).alias("n2"),
        F.sum("new_run").alias("R"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    er = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    vr = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return agg.select(
        F.col("n1").cast("long").alias("n_up"),
        F.col("n2").cast("long").alias("n_down"),
        F.col("R").cast("long").alias("n_runs"),
        F.round(er, 6).alias("expected_runs"),
        F.round(
            (F.col("R").cast("double") - er) / F.sqrt(vr), 6
        ).alias("z"),
    )


A_RUNS_SQL = """
WITH daily AS (
  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
    CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS y
  FROM events GROUP BY 1
),
signs AS (
  SELECT d, CASE WHEN chg > 0 THEN 1 ELSE 0 END AS up
  FROM (
    SELECT d, y - LAG(y) OVER (ORDER BY d) AS chg FROM daily
  ) WHERE chg IS NOT NULL AND chg <> 0
),
runs AS (
  SELECT up,
    CASE WHEN LAG(up) OVER (ORDER BY d) IS NULL
           OR LAG(up) OVER (ORDER BY d) <> up THEN 1 ELSE 0 END
      AS new_run
  FROM signs
),
agg AS (
  SELECT SUM(up) AS n1, SUM(1 - up) AS n2, SUM(new_run) AS R
  FROM runs
)
SELECT CAST(n1 AS BIGINT) AS n_up, CAST(n2 AS BIGINT) AS n_down,
  CAST(R AS BIGINT) AS n_runs,
  ROUND(2.0 * n1 * n2 / (n1 + n2) + 1.0, 6) AS expected_runs,
  ROUND((CAST(R AS DOUBLE) - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
    / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
           / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 6) AS z
FROM agg
"""


# ------------------------------------------------------------------ #
# e_knn_loo_accuracy
# ------------------------------------------------------------------ #


def e_knn_loo_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 1-NN cosine label accuracy per true label, over a
    fixed 200-probe eval set (``vec_id < 200``).

    Scale design (r6): exact LOO 1-NN over the FULL corpus is
    inherently all-pairs — quadratic work no join strategy fixes — so
    the metric is evaluated on a literal-bounded probe sample against
    the full streaming corpus (the ``e_cosine_topk`` pattern): linear
    in corpus size, probe side broadcast by construction.  The 1-NN
    winner per probe comes from the shared two-stage hash-aggregate
    argmax of ``probe_label_nn`` (r8: the previous corpus-scale
    ``min_by(clbl, struct(-ci, clbl))`` planned as SortAggregate —
    struct agg buffers are non-primitive — sorting the
    corpus x probes stream inside every map task; see the operator
    docstring for the max-then-argmax equivalence argument) — no
    per-probe window funneling the corpus through one task.
    """
    from idn_area_etl_spark.operators.similarity import probe_label_nn

    emb = load_table(spark, sf_dir, "embeddings")
    nn = probe_label_nn(emb).select(
        "qid",
        F.col("truth").alias("qlbl"),
        F.col("pred").alias("clbl"),
    )
    return (
        nn.groupBy("qlbl")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("clbl") == F.col("qlbl")).cast("long")).alias(
                "n_correct"
            ),
        )
        .select(
            F.col("qlbl").alias("label"),
            "n",
            "n_correct",
            F.round(
                F.col("n_correct").cast("double") / F.col("n"), 6
            ).alias("loo_accuracy"),
        )
        .orderBy("label")
    )


E_KNN_SQL = """
WITH v AS (
  SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS vec
  FROM embeddings
),
norms AS (
  SELECT vec_id, label, vec,
    sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
  FROM v
),
nn AS (
  SELECT q.vec_id AS qid, q.label AS qlbl, c.label AS clbl
  FROM norms q JOIN norms c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 200
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
    ROUND(list_sum(list_transform(generate_series(1, len(q.vec)),
        i -> q.vec[i] * c.vec[i])) / (q.nrm * c.nrm), 6) DESC,
    c.label) = 1
)
SELECT qlbl AS label, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN clbl = qlbl THEN 1 ELSE 0 END) AS BIGINT)
    AS n_correct,
  ROUND(CAST(SUM(CASE WHEN clbl = qlbl THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*), 6) AS loo_accuracy
FROM nn GROUP BY qlbl ORDER BY qlbl
"""


# ------------------------------------------------------------------ #
# q_ship_lead_time
# ------------------------------------------------------------------ #


def q_ship_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lead-time quartiles (percentile_disc) per order
    priority."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lead = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .alias("days"),
    )
    disc = lambda p: F.expr(  # noqa: E731
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY days)"
    )
    return (
        lead.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            disc(0.25).cast("long").alias("p25_days"),
            disc(0.5).cast("long").alias("p50_days"),
            disc(0.75).cast("long").alias("p75_days"),
        )
        .orderBy("o_orderpriority")
    )


Q_LEAD_SQL = """
WITH lead AS (
  SELECT o_orderpriority,
    datediff('day', CAST(o_orderdate AS DATE),
             CAST(l_shipdate AS DATE)) AS days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(quantile_disc(days, 0.25) AS BIGINT) AS p25_days,
  CAST(quantile_disc(days, 0.5) AS BIGINT) AS p50_days,
  CAST(quantile_disc(days, 0.75) AS BIGINT) AS p75_days
FROM lead GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


SPECS = [
    QuerySpec(
        "a_runs_test",
        a_runs_test,
        A_RUNS_SQL,
        doc="Wald-Wolfowitz runs test on daily revenue direction",
        tags=("timeseries", "stats"),
    ),
    QuerySpec(
        "e_knn_loo_accuracy",
        e_knn_loo_accuracy,
        E_KNN_SQL,
        doc="leave-one-out 1-NN cosine label accuracy per label",
        tags=("embedding", "eval"),
    ),
    QuerySpec(
        "q_ship_lead_time",
        q_ship_lead_time,
        Q_LEAD_SQL,
        doc="exact lead-time quartiles (percentile_disc) per priority",
        tags=("bi", "fulfillment"),
    ),
]
