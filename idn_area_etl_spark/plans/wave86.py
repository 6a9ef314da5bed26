"""Eighty-sixth wave: Cohen's d, seasonal MASE, and character-class
profiling.

Reference parity note: standardized effect sizes + forecast
evaluation + text composition; every query carries an exact DuckDB
oracle.

- **Cohen's d** (`a_cohens_d`) — the standardized mean difference of
  user total value across md5 arms with the pooled standard
  deviation: the effect size every meta-analysis asks for, from
  exact decimal moments.
- **Seasonal MASE** (`a_mase_seasonal`) — forecast-eval discipline:
  the mean absolute error of the seasonal-naive (lag-7) forecast of
  daily revenue scaled by the in-sample naive (lag-1) MAE.
  MASE < 1 means weekly seasonality beats carry-forward.
- **Char-class profile** (`d_char_class_profile`) — per-language
  character composition (letters / digits / spaces / other shares):
  the cheap structural fingerprint used to spot markup-polluted or
  numeric-table shards before tokenization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.sources.tables import load_table


# ------------------------------------------------------------------ #
# a_cohens_d
# ------------------------------------------------------------------ #


def a_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d of user total value across md5 arms."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(27,6)"))
        .cast("double")
        .alias("tv")
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("arm:"), F.col("user_id").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    cells = per_user.select(arm.alias("g"), "tv").groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum(F.col("tv").cast("decimal(27,6)")).alias("s"),
        F.sum((F.col("tv") * F.col("tv")).cast("decimal(38,8)")).alias(
            "ss"
        ),
    ).select(
        "g",
        "n",
        F.col("s").cast("double").alias("s"),
        F.col("ss").cast("double").alias("ss"),
    )
    wide = cells.agg(
        *[
            F.max(F.when(F.col("g") == g, F.col(c))).alias(f"{c}{g}")
            for g in (0, 1)
            for c in ("n", "s", "ss")
        ]
    )

    def mean(g):
        return F.col(f"s{g}") / F.col(f"n{g}")

    def ssd(g):
        return F.col(f"ss{g}") - F.col(f"s{g}") * mean(g)

    pooled_var = (ssd(0) + ssd(1)) / (
        F.col("n0") + F.col("n1") - 2
    )
    d = (mean(1) - mean(0)) / F.sqrt(pooled_var)
    return wide.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("n1").cast("long").alias("n_treat"),
        F.round(mean(1) - mean(0), 6).alias("mean_diff"),
        F.round(F.sqrt(pooled_var), 6).alias("pooled_sd"),
        F.round(d, 6).alias("cohens_d"),
    )


A_COHEND_SQL = """
WITH per_user AS (
  SELECT user_id,
    CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS tv
  FROM events GROUP BY user_id
),
cells AS (
  SELECT CAST(('0x' || substring(md5('arm:' ||
      CAST(user_id AS VARCHAR)), 1, 13)) AS UBIGINT) % 2 AS g,
    COUNT(*) AS n,
    CAST(SUM(CAST(tv AS DECIMAL(27,6))) AS DOUBLE) AS s,
    CAST(SUM(CAST(tv * tv AS DECIMAL(38,8))) AS DOUBLE) AS ss
  FROM per_user GROUP BY 1
),
wide AS (
  SELECT
    MAX(CASE WHEN g = 0 THEN n END) AS n0,
    MAX(CASE WHEN g = 0 THEN s END) AS s0,
    MAX(CASE WHEN g = 0 THEN ss END) AS ss0,
    MAX(CASE WHEN g = 1 THEN n END) AS n1,
    MAX(CASE WHEN g = 1 THEN s END) AS s1,
    MAX(CASE WHEN g = 1 THEN ss END) AS ss1
  FROM cells
)
SELECT CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treat,
  ROUND(s1 / n1 - s0 / n0, 6) AS mean_diff,
  ROUND(sqrt(((ss0 - s0 * (s0 / n0)) + (ss1 - s1 * (s1 / n1)))
        / (n0 + n1 - 2)), 6) AS pooled_sd,
  ROUND((s1 / n1 - s0 / n0)
    / sqrt(((ss0 - s0 * (s0 / n0)) + (ss1 - s1 * (s1 / n1)))
           / (n0 + n1 - 2)), 6) AS cohens_d
FROM wide
"""


# ------------------------------------------------------------------ #
# a_mase_seasonal
# ------------------------------------------------------------------ #


def a_mase_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE of the seasonal-naive (lag-7) daily-revenue forecast vs
    the naive (lag-1) scale."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).agg(
        F.sum(F.col("value").cast("decimal(27,6)"))
        .cast("double")
        .alias("y")
    )
    w = Window.orderBy("d")
    errs = daily.select(
        "d",
        F.abs(F.col("y") - F.lag("y", 7).over(w)).alias("e7"),
        F.abs(F.col("y") - F.lag("y", 1).over(w)).alias("e1"),
    )
    agg = errs.agg(
        F.sum(
            F.when(F.col("e7").isNotNull(), 1).otherwise(0)
        ).alias("n7"),
        F.sum(
            F.when(F.col("e1").isNotNull(), 1).otherwise(0)
        ).alias("n1"),
        F.sum(F.col("e7").cast("decimal(27,6)")).alias("s7"),
        F.sum(F.col("e1").cast("decimal(27,6)")).alias("s1"),
    )
    mae7 = F.col("s7").cast("double") / F.col("n7")
    mae1 = F.col("s1").cast("double") / F.col("n1")
    return agg.select(
        F.col("n7").cast("long").alias("n_seasonal_errors"),
        F.round(mae7, 6).alias("mae_seasonal_naive"),
        F.round(mae1, 6).alias("mae_naive"),
        F.round(mae7 / mae1, 6).alias("mase"),
    )


A_MASE_SQL = """
WITH daily AS (
  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
    CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS y
  FROM events GROUP BY 1
),
errs AS (
  SELECT d,
    ABS(y - LAG(y, 7) OVER (ORDER BY d)) AS e7,
    ABS(y - LAG(y, 1) OVER (ORDER BY d)) AS e1
  FROM daily
),
agg AS (
  SELECT SUM(CASE WHEN e7 IS NOT NULL THEN 1 ELSE 0 END) AS n7,
    SUM(CASE WHEN e1 IS NOT NULL THEN 1 ELSE 0 END) AS n1,
    CAST(SUM(CAST(e7 AS DECIMAL(27,6))) AS DOUBLE) AS s7,
    CAST(SUM(CAST(e1 AS DECIMAL(27,6))) AS DOUBLE) AS s1
  FROM errs
)
SELECT CAST(n7 AS BIGINT) AS n_seasonal_errors,
  ROUND(s7 / n7, 6) AS mae_seasonal_naive,
  ROUND(s1 / n1, 6) AS mae_naive,
  ROUND((s7 / n7) / (s1 / n1), 6) AS mase
FROM agg
"""


# ------------------------------------------------------------------ #
# d_char_class_profile
# ------------------------------------------------------------------ #


def d_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Letter / digit / space / other character shares per language."""
    docs = load_table(spark, sf_dir, "documents")
    total = F.length("text")
    letters = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace("text", r"[^0-9]", ""))
    spaces = F.length(F.regexp_replace("text", r"[^ ]", ""))
    agg = docs.groupBy("lang").agg(
        F.sum(total.cast("decimal(20,0)")).alias("chars"),
        F.sum(letters.cast("decimal(20,0)")).alias("letters"),
        F.sum(digits.cast("decimal(20,0)")).alias("digits"),
        F.sum(spaces.cast("decimal(20,0)")).alias("spaces"),
    )
    c = F.col("chars").cast("double")
    return agg.select(
        "lang",
        F.col("chars").cast("long").alias("n_chars"),
        F.round(F.col("letters").cast("double") / c, 6).alias(
            "letter_share"
        ),
        F.round(F.col("digits").cast("double") / c, 6).alias(
            "digit_share"
        ),
        F.round(F.col("spaces").cast("double") / c, 6).alias(
            "space_share"
        ),
        F.round(
            (
                F.col("chars")
                - F.col("letters")
                - F.col("digits")
                - F.col("spaces")
            ).cast("double")
            / c,
            6,
        ).alias("other_share"),
    ).orderBy("lang")


D_CHARCLASS_SQL = """
WITH agg AS (
  SELECT lang,
    SUM(CAST(length(text) AS DECIMAL(20,0))) AS chars,
    SUM(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        AS DECIMAL(20,0))) AS letters,
    SUM(CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
        AS DECIMAL(20,0))) AS digits,
    SUM(CAST(length(regexp_replace(text, '[^ ]', '', 'g'))
        AS DECIMAL(20,0))) AS spaces
  FROM documents GROUP BY lang
)
SELECT lang, CAST(chars AS BIGINT) AS n_chars,
  ROUND(CAST(letters AS DOUBLE) / CAST(chars AS DOUBLE), 6)
    AS letter_share,
  ROUND(CAST(digits AS DOUBLE) / CAST(chars AS DOUBLE), 6)
    AS digit_share,
  ROUND(CAST(spaces AS DOUBLE) / CAST(chars AS DOUBLE), 6)
    AS space_share,
  ROUND(CAST(chars - letters - digits - spaces AS DOUBLE)
        / CAST(chars AS DOUBLE), 6) AS other_share
FROM agg ORDER BY lang
"""


SPECS = [
    QuerySpec(
        "a_cohens_d",
        a_cohens_d,
        A_COHEND_SQL,
        doc="Cohen's d of user value across md5 arms (pooled SD)",
        tags=("stats", "experimentation"),
    ),
    QuerySpec(
        "a_mase_seasonal",
        a_mase_seasonal,
        A_MASE_SQL,
        doc="MASE of lag-7 seasonal-naive vs lag-1 naive forecasts",
        tags=("timeseries", "eval"),
    ),
    QuerySpec(
        "d_char_class_profile",
        d_char_class_profile,
        D_CHARCLASS_SQL,
        doc="letter/digit/space/other character shares per language",
        tags=("text",),
    ),
]
