"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only cross-batch state is the ``_seen_provinces`` set
(SURVEY.md §2.9) which maps to built-in ``dropDuplicates``; this
module adds the general-purpose form — an arbitrary per-key
accumulator that survives micro-batches — as a pipeline would need for
running per-user/per-source counters over an unbounded event stream.

Scale: state is hash-partitioned by key into Spark's state store
(RocksDB-backed on a real cluster), so memory per executor is
O(keys / executors); the Arrow batch transfer keeps the Python hop
vectorized.  Emitting only updated keys per batch (``outputMode
"update"``) bounds sink traffic to the touched key set.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Running per-user event count and value total across
    micro-batches.

    Input stream schema must include ``user_id`` and ``value``.  Each
    micro-batch emits one row per *touched* user carrying the
    accumulated totals since stream start.
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
