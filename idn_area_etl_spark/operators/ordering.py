"""Order-aware operators.

Spark provides no implicit row order; the reference relies on
sequential document order for both output layout and its
first-occurrence-wins province dedup (SURVEY.md §2.4 A1, §2.6 O2).
Both are expressed with explicit lineage columns + window functions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_seen(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str] = ("page_no", "table_no", "row_no"),
) -> DataFrame:
    """Keep the first-seen row per key in document order.

    Reference semantics: the ``_seen_provinces`` run-global set
    (extractors.py:110-112, 166-169) keeps the first occurrence of each
    province code.  ``dropDuplicates`` keeps an *arbitrary* row, so a
    ``row_number`` window over the lineage columns is used instead.

    Scale note: this shuffles once on ``keys`` — same exchange a
    ``dropDuplicates`` would do; no extra cost for determinism.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
