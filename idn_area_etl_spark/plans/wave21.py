"""Twenty-first wave: regression and econometric statistics.

Reference parity note: the reference engine (idn-area-etl) has no
statistics surface at all (SURVEY.md §2.4 "aggregations: counters
only") — this wave is engine-native analytics a warehouse user
expects, built on the exact-decimal power-sum pattern proven in
q_corr_qty_price / q_ab_ttest:

- **OLS regression per group** — slope / intercept / R² of
  extendedprice on quantity from five map-side-combinable decimal
  sums; bit-deterministic under any partitioning (REGR_SLOPE's
  streaming float reduction is not).
- **Chi-square independence** — order priority × customer market
  segment contingency table with expected counts and per-cell chi²
  contributions; row/column marginals via two tiny broadcast joins
  (O(distinct) rows — never a wide shuffle).
- **Gini coefficient per nation** — inequality of positive account
  balances via the sorted-rank formula G = 2·Σ(i·x_i)/(n·Σx) −
  (n+1)/n; one window rank + one aggregation, deterministic under
  ties because equal values contribute equal rank-sums.
- **EWMA (span-10) per user** — exponentially weighted moving
  average over each user's event series as a closed-form 10-term
  lag polynomial (a recursive state fold would force a sequential
  scan; the truncated closed form stays in whole-stage codegen and
  the dropped tail is < (1-α)^10 ≈ 5.6% of weight, renormalized
  away by the explicit weight denominator).

Scale: every query is a constant number of narrow window passes or
one grouped aggregation; nothing is O(n²) and no driver collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.ranks import grouped_running_multi
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


def _dsum(c: Column, alias: str) -> Column:
    return F.sum(c.cast("decimal(30,6)")).cast("double").alias(alias)


def q_ols_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS fit of l_extendedprice ~ l_quantity.

    slope/intercept/R² from exact decimal power sums (n, Σx, Σy,
    Σxx, Σyy, Σxy) — one partial-aggregatable pass, O(groups)
    shuffle, bit-reproducible.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        _dsum(x, "sx"),
        _dsum(y, "sy"),
        _dsum(x * x, "sxx"),
        _dsum(y * y, "syy"),
        _dsum(x * y, "sxy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x_n
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = (cov_n * cov_n) / (var_x_n * var_y_n)
    return sums.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    ).orderBy("l_returnflag")


Q_OLS_SQL = """
WITH sums AS (
  SELECT l_returnflag, COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6)))
         AS DOUBLE) AS sxx,
    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6)))
         AS DOUBLE) AS syy,
    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,6)))
         AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
        / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
  ROUND((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
        / CAST(n AS DOUBLE), 6) AS intercept,
  ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
        * (CAST(n AS DOUBLE) * sxy - sx * sy)
        / ((CAST(n AS DOUBLE) * sxx - sx * sx)
           * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r2
FROM sums ORDER BY l_returnflag
"""


def q_chi2_priority_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence: order priority × customer segment.

    Contingency cells in one grouped count; marginals re-derived by
    two window sums over the tiny cell table (25 rows) — the fact
    table is scanned exactly once.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(
            c.select("c_custkey", "c_mktsegment"),
            o.o_custkey == F.col("c_custkey"),
        )
        .groupBy("o_orderpriority", "c_mktsegment")
        .agg(F.count("*").alias("obs"))
    )
    w_row = Window.partitionBy("o_orderpriority")
    w_col = Window.partitionBy("c_mktsegment")
    w_all = Window.partitionBy()
    row_t = F.sum("obs").over(w_row).cast("double")
    col_t = F.sum("obs").over(w_col).cast("double")
    grand = F.sum("obs").over(w_all).cast("double")
    exp = row_t * col_t / grand
    obs_d = F.col("obs").cast("double")
    return cells.select(
        "o_orderpriority",
        "c_mktsegment",
        "obs",
        F.round(exp, 6).alias("expected"),
        F.round((obs_d - exp) * (obs_d - exp) / exp, 6).alias(
            "chi2_contrib"
        ),
    ).orderBy("o_orderpriority", "c_mktsegment")


Q_CHI2_SQL = """
WITH cells AS (
  SELECT o_orderpriority, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS obs
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)
SELECT o_orderpriority, c_mktsegment, obs,
  ROUND(CAST(SUM(obs) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
        * CAST(SUM(obs) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
        / CAST(SUM(obs) OVER () AS DOUBLE), 6) AS expected,
  ROUND((CAST(obs AS DOUBLE)
         - CAST(SUM(obs) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
           * CAST(SUM(obs) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
           / CAST(SUM(obs) OVER () AS DOUBLE))
        * (CAST(obs AS DOUBLE)
           - CAST(SUM(obs) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
             * CAST(SUM(obs) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
             / CAST(SUM(obs) OVER () AS DOUBLE))
        / (CAST(SUM(obs) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
           * CAST(SUM(obs) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
           / CAST(SUM(obs) OVER () AS DOUBLE)), 6) AS chi2_contrib
FROM cells
ORDER BY o_orderpriority, c_mktsegment
"""


def q_gini_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of positive account balances.

    Sorted-rank formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n with a
    deterministic (value, custkey) rank; Σ(i·x_i) is invariant to
    tie order because tied values are equal.  One range shuffle + one
    aggregation — no O(n²) pair join.

    Scale (r7, window-funnel gate): the per-nation rank comes from
    ``ranks.grouped_running_multi`` — c_nationkey has a 25-value
    domain, so a plain per-nation window would stream 1/25th of the
    customer table (data-scaled) through one task.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    ranked = grouped_running_multi(
        c.select(
            "c_nationkey",
            "c_acctbal",
            "c_custkey",
            F.col("c_acctbal").cast("decimal(30,6)").alias("bal"),
        ),
        ["c_nationkey"],
        [F.col("c_acctbal"), F.col("c_custkey")],
        {"one": F.lit(1)},
    ).select("c_nationkey", "bal", F.col("grun_one").alias("i"))
    sums = ranked.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.sum("bal").cast("double").alias("sx"),
        F.sum(F.col("i") * F.col("bal")).cast("double").alias("six"),
    )
    n = F.col("n").cast("double")
    gini = 2.0 * F.col("six") / (n * F.col("sx")) - (n + 1.0) / n
    return sums.select(
        "c_nationkey", "n", F.round(gini, 6).alias("gini")
    ).orderBy("c_nationkey")


Q_GINI_SQL = """
WITH ranked AS (
  SELECT c_nationkey,
    CAST(c_acctbal AS DECIMAL(30,6)) AS bal,
    ROW_NUMBER() OVER (PARTITION BY c_nationkey
                       ORDER BY c_acctbal, c_custkey) AS i
  FROM customer WHERE c_acctbal > 0
),
sums AS (
  SELECT c_nationkey, COUNT(*) AS n,
    CAST(SUM(bal) AS DOUBLE) AS sx,
    CAST(SUM(i * bal) AS DOUBLE) AS six
  FROM ranked GROUP BY 1
)
SELECT c_nationkey, n,
  ROUND(2.0 * six / (CAST(n AS DOUBLE) * sx)
        - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
FROM sums ORDER BY c_nationkey
"""


EWMA_ALPHA = 0.4
EWMA_TERMS = 10


def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-limited EWMA of each user's event values, reported at the
    latest event.

    Closed-form 10-term lag polynomial: Σ w_j·x_{t-j} / Σ w_j with
    w_j = (1-α)^j over available lags — equivalent to the recursive
    EWMA truncated at 10 terms and renormalized.  Stays entirely in
    whole-stage codegen (no sequential state fold, no UDF).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num: Column = F.lit(0.0)
    den: Column = F.lit(0.0)
    for j in range(EWMA_TERMS):
        weight = (1.0 - EWMA_ALPHA) ** j
        lagged = F.lag("value", j).over(w) if j else F.col("value")
        num = num + F.coalesce(lagged * weight, F.lit(0.0))
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(0.0)
    scored = ev.select(
        "user_id",
        "event_id",
        F.round(num / den, 6).alias("ewma"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn"),
    )
    return (
        scored.filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ewma")
        .orderBy("user_id")
    )


def _ewma_sql_terms() -> tuple[str, str]:
    nums, dens = [], []
    for j in range(EWMA_TERMS):
        weight = repr((1.0 - EWMA_ALPHA) ** j)
        lag = (
            "value"
            if j == 0
            else f"LAG(value, {j}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        )
        nums.append(f"COALESCE({lag} * {weight}, 0.0)")
        dens.append(
            f"CASE WHEN {lag} IS NOT NULL THEN {weight} ELSE 0.0 END"
        )
    return " + ".join(nums), " + ".join(dens)


_N, _D = _ewma_sql_terms()
Q_EWMA_SQL = f"""
WITH scored AS (
  SELECT user_id, event_id,
    ROUND(({_N}) / ({_D}), 6) AS ewma,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, ewma FROM scored WHERE rn = 1
ORDER BY user_id
"""


SPECS = [
    QuerySpec("q_ols_price_quantity", q_ols_price_quantity, Q_OLS_SQL,
              doc="per-group OLS slope/intercept/R2 from exact decimal sums",
              tags=("stats",)),
    QuerySpec("q_chi2_priority_segment", q_chi2_priority_segment,
              Q_CHI2_SQL,
              doc="chi-square independence contingency audit",
              tags=("stats",)),
    QuerySpec("q_gini_acctbal", q_gini_acctbal, Q_GINI_SQL,
              doc="per-nation Gini inequality coefficient",
              tags=("stats",)),
    QuerySpec("q_ewma_user_value", q_ewma_user_value, Q_EWMA_SQL,
              doc="span-10 EWMA as closed-form lag polynomial",
              tags=("events", "stats")),
]
