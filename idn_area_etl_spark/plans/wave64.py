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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.isotonic import fit_isotonic_binned
from idn_area_etl_spark.plans.registry import QuerySpec
from idn_area_etl_spark.plans.wave32 import _score_expr
from idn_area_etl_spark.sources.tables import load_table


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


SPECS = [
    QuerySpec(
        "e_isotonic_calibration",
        e_isotonic_calibration,
        None,  # PAVA is not SQL-expressible; pytest-certified
        doc="binned isotonic (PAVA) calibration via applyInPandas",
        tags=("ml-eval", "pandas-udf"),
    ),
]
