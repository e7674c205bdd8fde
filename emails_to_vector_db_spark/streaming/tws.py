"""Arbitrary stateful streaming via Spark 4's transformWithStateInPandas.

The successor API to ``applyInPandasWithState`` (streaming/stateful.py):
instead of one opaque state tuple, the processor owns typed, named state
primitives — ValueState / ListState / MapState — each independently
checkpointed, plus timers. This operator keeps a per-user profile where
the distinct-event-type breakdown lives in a MapState keyed by event
type: at 100 TB the state store shards by user key, each micro-batch
touches only the keys it contains, and a map entry updates without
rewriting the whole profile (the win over the single-tuple API).

CONTAINER GATE: executing a transformWithState query requires the
``google.protobuf`` package (PySpark's state-server wire protocol —
``pyspark/sql/streaming/proto/StateMessage_pb2.py``), which is not
installed here and installs are disallowed. Plan construction and the
processor itself are fully testable without it (tests/test_streaming.py);
the execution test auto-skips when protobuf is absent, mirroring the
sentence-transformers and codec gates. ``applyInPandasWithState``
(streaming/stateful.py) provides the executed custom-stateful coverage.
It also requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, n_types bigint, total_value double"
)


class UserProfileProcessor(StatefulProcessor):
    """Running per-user profile: event count + value sum in a ValueState,
    per-event-type counts in a MapState (distinct-type count = map size,
    maintained incrementally — no re-scan of history)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n bigint, total double"
        )
        self._by_type = handle.getMapState(
            "by_type", "event_type string", "cnt bigint"
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        if self._totals.exists():
            n, total = self._totals.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            for etype, cnt in pdf.groupby("event_type").size().items():
                prev = (
                    self._by_type.getValue((etype,))[0]
                    if self._by_type.containsKey((etype,))
                    else 0
                )
                self._by_type.updateValue((etype,), (prev + int(cnt),))
        self._totals.update((n, total))
        n_types = sum(1 for _ in self._by_type.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_types": [n_types],
                "total_value": [total],
            }
        )

    def close(self) -> None:
        pass


def running_user_profiles_tws(events: DataFrame) -> DataFrame:
    """Streaming DataFrame → one updated profile row per user per
    micro-batch (output mode 'update'; latest row per user is live)."""
    prepared = events.select("user_id", "event_type", "value")
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
