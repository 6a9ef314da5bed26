"""Sixty-fourth wave: isotonic calibration (custom Pandas-UDF
operator).

Reference parity note: the monotone score->probability calibration
map (Zadrozny-Elkan isotonic regression).  The pool-adjacent-
violators loop is not expressible in portable SQL, so the query is
rows-only; the operator is certified in tests/test_isotonic.py
against an exact pure-Python PAVA reference, with monotonicity,
mean-preservation and binned-equals-exact equivalence pinned.

- **Isotonic calibration** (`e_isotonic_calibration`) — the wave-32
  logistic score calibrated against label parity over 20 score
  bins: built-in aggregations reduce the corpus to per-bin weighted
  means (the only corpus-scale work), then weighted PAVA runs over
  the tiny bin table inside `applyInPandas`.
- **Planted isotonic fixed point** (`e_isotonic_planted`) — the
  exact-oracle twin (r6, the planted-ANN pattern): a deliberately
  MONOTONE calibration problem — every row in score-bin b carries
  y = b/32 exactly — must come back UNCHANGED by PAVA (monotone
  input is a fixed point of isotonic regression), so plain SQL can
  pin the full output including the calibrated values.  All
  arithmetic is exact: b/32 is a 5-bit binary fraction, the bin
  mean is (n·b/32)/n, and no pool merge ever fires, so the check
  is independent of pandas/Arrow float behavior and of pooling
  order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.isotonic import fit_isotonic_binned
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.plans.wave32 import _score_expr
from idn_area_etl_spark.sources.tables import load_table

#: 2^52 — 13 hex chars of md5, exactly representable in a double.
_TWO_52 = float(1 << 52)


def e_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned isotonic calibration of the logistic scorer (20 bins,
    single model group)."""
    emb = load_table(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.lit(0).alias("group_id"),
        _score_expr(F.col("embedding")).alias("score"),
        (F.col("label") % 2 == 1).cast("double").alias("y"),
    )
    return fit_isotonic_binned(scored, n_bins=20).orderBy(
        "group_id", "bin"
    )


def e_isotonic_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted isotonic fixed point: run the REAL binned-PAVA operator
    on a deliberately monotone problem (y = bin/32 exactly for every
    row in bin b) and verify it returns the input means unchanged —
    the exact oracle the general PAVA loop cannot have (see module
    docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("iso:"), F.col("vec_id").cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("double")
    score = (v + F.lit(0.5)) / F.lit(_TWO_52)
    bin_ = F.least(F.lit(19), F.floor(score * 20).cast("int"))
    scored = emb.select(
        F.lit(0).alias("group_id"),
        score.alias("score"),
        (bin_.cast("double") / 32).alias("y"),
    )
    return fit_isotonic_binned(scored, n_bins=20).orderBy(
        "group_id", "bin"
    )


E_ISOTONIC_PLANTED_SQL = """
WITH keyed AS (
  -- the inner CAST AS DOUBLE matters: DuckDB evaluates UBIGINT + 0.5
  -- in DECIMAL arithmetic, whose cast-to-double at the division can
  -- land 1 ulp away from the IEEE double path Spark uses
  SELECT (CAST(CAST(('0x' || substring(md5('iso:' || CAST(vec_id AS VARCHAR)),
                1, 13)) AS UBIGINT) AS DOUBLE) + 0.5)
         / 4503599627370496.0 AS score
  FROM embeddings
),
binned AS (
  SELECT LEAST(19, CAST(floor(score * 20) AS INT)) AS bin, score
  FROM keyed
)
SELECT CAST(0 AS BIGINT) AS group_id,
  CAST(bin AS BIGINT) AS bin,
  MIN(score) AS lo_score,
  MAX(score) AS hi_score,
  CAST(COUNT(*) AS BIGINT) AS n,
  bin / 32.0 AS calibrated
FROM binned
GROUP BY bin
ORDER BY group_id, bin
"""


SPECS = [
    QuerySpec(
        "e_isotonic_calibration",
        e_isotonic_calibration,
        None,  # PAVA is not SQL-expressible; pytest-certified
        doc="binned isotonic (PAVA) calibration via applyInPandas",
        tags=("ml-eval", "pandas-udf"),
    ),
    QuerySpec(
        "e_isotonic_planted",
        e_isotonic_planted,
        E_ISOTONIC_PLANTED_SQL,
        doc="planted monotone fixed point: PAVA must return the exact "
            "per-bin means unchanged (exact SQL oracle)",
        tags=("ml-eval", "pandas-udf", "planted"),
    ),
]
