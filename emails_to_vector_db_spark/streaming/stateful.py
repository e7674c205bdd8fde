"""Custom stateful streaming operators via applyInPandasWithState.

SURVEY.md §2.8's last row: arbitrary per-key state beyond what windowed
aggregations express. The example operator keeps a running per-user
profile (event count, value sum, last-seen event time) that survives
across micro-batches — the building block for online feature stores and
incremental user aggregates at 100 TB (state is partitioned by key and
checkpointed; each micro-batch touches only the keys it contains).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, last_seen_us bigint"
)
STATE_SCHEMA = "n bigint, total double, last_us bigint"


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_seen_us": [last_us],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Streaming DataFrame -> one updated profile row per user per batch.
    Use output mode 'update'; the latest row per user is the live profile."""
    prepared = events.select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
