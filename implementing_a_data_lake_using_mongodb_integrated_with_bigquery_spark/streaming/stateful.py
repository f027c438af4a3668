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


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the successor API to
# applyInPandasWithState. Differences that matter at scale: typed,
# NAMED state slots (value/list/map) instead of one monolithic tuple —
# the state store reads only the slots a processor touches; built-in
# per-slot TTL; processing/event-time timers; and initial-state
# bootstrap. The processor below is the same running per-user profile
# as _update_profile, so the two APIs can be parity-tested against
# each other; it additionally emits a budget-crossing alert stream
# (the K7-style notification, computed from state instead of a crash).
#
# Environment gate: executing a transformWithStateInPandas stream
# requires google.protobuf in the Python workers (the JVM↔Python
# state-server protocol); in a container without protobuf the query
# crashes at start with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE,
# so the parity test skips when the import is unavailable. The
# applyInPandasWithState path has no such dependency and remains the
# executed-by-default stateful operator here.
# ---------------------------------------------------------------------------

try:  # transformWithStateInPandas needs pyspark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _HAVE_TWS = True
except ImportError:  # pragma: no cover - container always has 4.x
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAVE_TWS = False

TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_4dp", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("budget_alerts", T.LongType()),
    ]
)


class RunningProfileProcessor(StatefulProcessor):
    """Per-user running profile + budget-threshold alert counter.

    State: one ValueState slot holding (n_events, sum_value_4dp,
    last_ts_us, last_event_id). ``budget_alerts`` counts how many
    multiples of ``alert_every_4dp`` the cumulative sum has crossed —
    the classic "notify on spend" stateful pattern."""

    def __init__(self, alert_every_4dp: int = 1_000_000):
        self._alert_every = alert_every_4dp

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState(
            "profile",
            "n_events long, sum_value_4dp long, last_ts_us long, last_event_id long",
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        n, sv, lts, leid = (
            self._state.get() if self._state.exists() else (0, 0, -1, -1)
        )
        for pdf in rows:
            n += len(pdf)
            sv += int((pdf["value"] * 10000).round().astype("int64").sum())
            ts_us = (pdf["ts"].astype("int64") // 1000).astype("int64")
            newest = ts_us.idxmax()
            if int(ts_us.loc[newest]) >= lts:
                lts = int(ts_us.loc[newest])
                leid = int(pdf["event_id"].loc[newest])
        self._state.update((n, sv, lts, leid))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value_4dp": [sv],
                "last_event_id": [leid],
                "budget_alerts": [max(sv, 0) // self._alert_every],
            }
        )

    def close(self) -> None:
        pass


def running_user_profiles_tws(
    events: DataFrame, alert_every_4dp: int = 1_000_000
) -> DataFrame:
    """transformWithStateInPandas twin of :func:`running_user_profiles`
    (parity-tested): same state partitioning and checkpoint story, new
    typed-state API."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningProfileProcessor(alert_every_4dp),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
