"""Stream-stream joins: watermarked interval join of two event
streams (the attribution-join shape: purchase ← preceding click).

Both sides carry watermarks and the join condition bounds event-time
distance, so Spark can expire state: each side buffers only rows
younger than watermark + interval — bounded memory at any throughput,
the requirement for an unbounded 100 TB/day join.  Without the time
bound, a stream-stream inner join would keep all state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Join each purchase to clicks by the same user within
    ``max_delay`` before the purchase (inclusive on both ends).

    Works identically on streaming and batch DataFrames — the
    streaming planner turns the interval condition + watermarks into
    a state-bounded stream-stream join; Catalyst plans the batch
    version as a plain range-condition join.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = F.expr(
        f"c_user = p_user"
        f" AND click_ts >= purchase_ts - INTERVAL {max_delay}"
        f" AND click_ts <= purchase_ts"
    )
    return p.join(c, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "purchase_value",
        "click_ts",
        "click_value",
    )
