"""Skew-resistant aggregation via salting.

When a groupBy key is heavily skewed (one user/tenant dominating),
the single reducer owning the hot key becomes the straggler.  Salting
splits each key into ``n_salts`` sub-keys for a parallel partial
aggregation, then combines partials in a second (tiny) aggregation.

AQE's skew-join handling covers joins; this covers aggregations whose
partials are algebraic (count/sum/min/max).  Results are identical to
the unsalted plan — the oracle checks that.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {'count', 'sum', 'min', 'max'}.  ``salt_col`` must be a
    deterministic expression (e.g. ``xxhash64(id_col)``) so reruns
    agree; it is bucketed into ``n_salts`` partials.
    """
    salt = F.pmod(salt_col, F.lit(n_salts)).alias("_salt")

    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{out}"))
            final_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{out}"))
            final_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *partial_exprs
    )
    return partial.groupBy(*keys).agg(*final_exprs)
