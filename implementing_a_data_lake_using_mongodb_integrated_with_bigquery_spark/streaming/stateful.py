"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps its only "state" in the warehouse itself (the PK
existence probe, ``src/process_insert_update_weather_data.py:49-62``).
Spark gives real managed state: per-key state in the state store,
checkpointed, with timeout-based eviction. This module implements the
canonical custom stateful op a training-data pipeline needs: a running
per-key profile (event count, value sum, last-seen) that emits an
updated row per key per micro-batch — the streaming analogue of the
batch ``reconcile_counts`` + ``last_write_wins`` pair.

State is Arrow-batched per key group; the handler is pure pandas.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_4dp", T.LongType()),  # scaled-integer sum
        T.StructField("last_event_id", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_4dp", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, sv, lts, leid = state.get if state.exists else (0, 0, -1, -1)
    for pdf in pdfs:
        n += len(pdf)
        # scaled-integer accumulation: order-independent, exact
        sv += int((pdf["value"] * 10000).round().astype("int64").sum())
        ts_us = (pdf["ts"].astype("int64") // 1000).astype("int64")
        newest = ts_us.idxmax()
        if int(ts_us.loc[newest]) >= lts:
            lts = int(ts_us.loc[newest])
            leid = int(pdf["event_id"].loc[newest])
    state.update((n, sv, lts, leid))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value_4dp": [sv],
            "last_event_id": [leid],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """events(user_id, event_id, ts, value) stream → one updated
    profile row per active user per micro-batch. State lives in the
    checkpointed state store, partitioned by user_id — scales with
    |keys|/|executors|, no driver state."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
