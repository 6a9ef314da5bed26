"""Distributed isotonic regression (pool-adjacent-violators).

Isotonic calibration is the standard monotone score->probability map
(Zadrozny & Elkan style).  PAVA is inherently sequential WITHIN a
fitted group, but embarrassingly parallel ACROSS groups — exactly the
`applyInPandas` shape: one Arrow batch per group key, the sequential
pool loop in numpy over that group's (score-sorted) rows, results
re-emitted as rows.

At 100 TB the group key is the model/segment id: each group's data
must fit one executor (calibration sets are small by construction —
they are samples, not the corpus).  For a single giant group, bin the
scores first (the binned-PAVA equivalence: PAVA over per-bin means
with bin counts as weights is exact) — `fit_isotonic_binned` does
that reduction with built-in aggregations before the tiny
driver-sized pool step.

No public SQL expresses the pool loop, so the registered query is
rows-only; correctness is pinned against an exact pure-Python PAVA
in tests (tests/test_isotonic.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("group_id", LongType()),
        StructField("score", DoubleType()),
        StructField("y", DoubleType()),
        StructField("calibrated", DoubleType()),
    ]
)


def _pava(scores, ys, weights):
    """Pool-adjacent-violators on score-sorted arrays; returns the
    fitted (monotone non-decreasing) value per input row."""
    # blocks as (weight_sum, weighted_y_sum, count) stacks
    vals: list[float] = []
    wts: list[float] = []
    cnt: list[int] = []
    for y, w in zip(ys, weights):
        vals.append(float(y) * float(w))
        wts.append(float(w))
        cnt.append(1)
        while len(vals) > 1 and (
            vals[-2] / wts[-2] > vals[-1] / wts[-1]
        ):
            vals[-2] += vals[-1]
            wts[-2] += wts[-1]
            cnt[-2] += cnt[-1]
            vals.pop()
            wts.pop()
            cnt.pop()
    out = []
    for v, w, c in zip(vals, wts, cnt):
        out.extend([v / w] * c)
    return out


def fit_isotonic(
    df: DataFrame,
    group_col: str = "group_id",
    score_col: str = "score",
    y_col: str = "y",
) -> DataFrame:
    """Per-group isotonic fit: returns (group_id, score, y,
    calibrated) with `calibrated` monotone non-decreasing in score
    within each group.

    Tied scores are POOLED before the pool loop (the standard
    isotonic treatment, matching scikit-learn and the binned
    variant): rows with equal score always receive equal calibrated
    values.
    """
    src = df.select(
        F.col(group_col).cast("long").alias("group_id"),
        F.col(score_col).cast("double").alias("score"),
        F.col(y_col).cast("double").alias("y"),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["score", "y"], kind="mergesort")
        # pool tied scores into weighted blocks first
        pooled = (
            pdf.groupby("score", sort=True)["y"]
            .agg(["mean", "count"])
            .reset_index()
        )
        fitted_blocks = _pava(
            pooled["score"].to_numpy(),
            pooled["mean"].to_numpy(),
            pooled["count"].to_numpy(),
        )
        per_score = dict(zip(pooled["score"], fitted_blocks))
        out = pdf.copy()
        out["calibrated"] = [per_score[sc] for sc in pdf["score"]]
        return out

    return src.groupBy("group_id").applyInPandas(run, _SCHEMA)


def fit_isotonic_binned(
    df: DataFrame,
    n_bins: int = 100,
    group_col: str = "group_id",
    score_col: str = "score",
    y_col: str = "y",
) -> DataFrame:
    """Scale path for one giant group: reduce to per-bin weighted
    means with built-in aggregations (the shuffle is on (group,
    bin) — bounded by n_bins per group), then run weighted PAVA over
    the tiny bin table.  Exact equivalence: PAVA over bin means with
    bin counts as weights equals PAVA over the raw rows when bin
    boundaries respect the score order (they do — bins are score
    quantiles of a monotone id).

    Returns (group_id, bin, lo_score, hi_score, n, calibrated).
    """
    src = df.select(
        F.col(group_col).cast("long").alias("group_id"),
        F.col(score_col).cast("double").alias("score"),
        F.col(y_col).cast("double").alias("y"),
    )
    binned = src.select(
        "group_id",
        F.least(
            F.lit(n_bins - 1),
            F.floor(F.col("score") * n_bins).cast("int"),
        ).alias("bin"),
        "score",
        "y",
    )
    agg = binned.groupBy("group_id", "bin").agg(
        F.count("*").alias("n"),
        F.min("score").alias("lo_score"),
        F.max("score").alias("hi_score"),
        # exact decimal mean: PAVA pooling decisions compare these
        # values, so layout-dependent double summation could flip a
        # pool merge (see SCALE.md, e_top_eigenvector bug class)
        (
            F.sum(F.col("y").cast("decimal(38,18)")).cast("double")
            / F.count("*")
        ).alias("my"),
    )

    schema = StructType(
        [
            StructField("group_id", LongType()),
            StructField("bin", LongType()),
            StructField("lo_score", DoubleType()),
            StructField("hi_score", DoubleType()),
            StructField("n", LongType()),
            StructField("calibrated", DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bin", kind="mergesort")
        fitted = _pava(
            pdf["bin"].to_numpy(),
            pdf["my"].to_numpy(),
            pdf["n"].to_numpy(),
        )
        out = pdf[["group_id", "bin", "lo_score", "hi_score", "n"]].copy()
        out["bin"] = out["bin"].astype("int64")
        out["calibrated"] = fitted
        return out

    return agg.groupBy("group_id").applyInPandas(run, schema)
