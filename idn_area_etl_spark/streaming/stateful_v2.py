"""Custom stateful streaming via Spark 4's ``transformWithStateInPandas``.

The successor API to ``applyInPandasWithState`` (see ``stateful.py``
for the v1 form of the same accumulator): a ``StatefulProcessor``
object owns typed state primitives — here a ``ValueState`` for the
running totals plus a ``MapState`` keyed by event type — instead of a
single opaque tuple.  Advantages at scale:

- state is schematized per primitive, so the state store holds typed
  columns (RocksDB-backed on a cluster) rather than one pickled blob;
- ``MapState`` gives per-sub-key point reads/writes — updating one
  event type does not rewrite the whole per-user state;
- timers (``handle.registerTimer``) enable TTL/eviction without a
  separate janitor stream (not used here — processing-time timers
  don't fire deterministically under ``availableNow`` tests).

Environment note: the transformWithState runtime requires
``google.protobuf`` (its state-server wire protocol).  This container
lacks it, so the paired test skips via ``importorskip``; the module
itself imports fine and runs wherever protobuf exists.

Each micro-batch emits one row per touched user with the running
event count, value total, and number of distinct event types seen.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, n_event_types long"
)


class UserTotalsProcessor(StatefulProcessor):
    """Running per-user totals + per-event-type counts."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n long, total double"
        )
        self._per_type = handle.getMapState(
            "per_type", "event_type string", "cnt long"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = (
            self._totals.get() if self._totals.exists() else (0, 0.0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            for etype, cnt in pdf.groupby("event_type").size().items():
                prev = (
                    self._per_type.getValue((etype,))[0]
                    if self._per_type.containsKey((etype,))
                    else 0
                )
                self._per_type.updateValue((etype,), (prev + int(cnt),))
        self._totals.update((n, total))
        n_types = sum(1 for _ in self._per_type.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "n_event_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def running_user_profiles(events_stream: DataFrame) -> DataFrame:
    """transformWithState twin of ``running_user_totals`` with
    per-event-type map state.  Input needs ``user_id``, ``value``,
    ``event_type``."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        UserTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
