"""applyInPandasWithState: running per-user profiles over a stream."""

from __future__ import annotations

import json
import os

import pytest

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.stateful import (
    running_user_profiles,
)


def _write(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_running_profiles_accumulate_across_batches(spark, tmp_path):
    ev_dir = str(tmp_path / "ev")
    _write(ev_dir, "b0.json", [
        {"user_id": 1, "event_id": 10, "ts": "2024-01-01T00:00:00.000Z", "value": 1.5},
        {"user_id": 1, "event_id": 11, "ts": "2024-01-01T00:01:00.000Z", "value": 2.25},
        {"user_id": 2, "event_id": 20, "ts": "2024-01-01T00:00:30.000Z", "value": 10.0},
    ])
    schema = "user_id long, event_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(ev_dir)
    rows1: list = []
    q = (
        running_user_profiles(stream)
        .writeStream.foreachBatch(lambda df, _id: rows1.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: r for r in rows1}
    assert got[1].n_events == 2 and got[1].sum_value_4dp == 37500
    assert got[1].last_event_id == 11
    assert got[2].n_events == 1 and got[2].last_event_id == 20

    # second batch arrives later: state must carry over (not recount)
    _write(ev_dir, "b1.json", [
        {"user_id": 1, "event_id": 12, "ts": "2024-01-01T00:05:00.000Z", "value": 0.25},
    ])
    rows2: list = []
    q2 = (
        running_user_profiles(stream)
        .writeStream.foreachBatch(lambda df, _id: rows2.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))  # same checkpoint
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = {r.user_id: r for r in rows2}
    assert got2[1].n_events == 3 and got2[1].sum_value_4dp == 40000
    assert got2[1].last_event_id == 12
    assert 2 not in got2  # update mode: untouched keys don't re-emit


def _have_protobuf() -> bool:
    # transformWithStateInPandas runs a state-server protocol between
    # the JVM and a Python driver worker that needs google.protobuf;
    # absent it, the stream crashes at start with
    # STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _have_protobuf(),
    reason="transformWithStateInPandas needs protobuf in Python workers",
)
def test_transform_with_state_matches_apply_in_pandas_with_state(spark, tmp_path):
    """Parity: the Spark 4 transformWithStateInPandas processor must
    produce the same running profiles as the applyInPandasWithState
    path on the same two-batch input, plus the budget-alert counter."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.stateful import (
        running_user_profiles_tws,
    )

    ev_dir = str(tmp_path / "ev")
    _write(ev_dir, "b0.json", [
        {"user_id": 1, "event_id": 10, "ts": "2024-01-01T00:00:00.000Z", "value": 60.0},
        {"user_id": 1, "event_id": 11, "ts": "2024-01-01T00:01:00.000Z", "value": 55.0},
        {"user_id": 2, "event_id": 20, "ts": "2024-01-01T00:00:30.000Z", "value": 10.0},
    ])
    schema = "user_id long, event_id long, ts timestamp, value double"

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(ev_dir)
        )
        rows: list = []
        q = (
            running_user_profiles_tws(stream, alert_every_4dp=1_000_000)
            .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.user_id: r for r in rows}

    got = run("ckpt_tws")
    # 60 + 55 = 115.0 → 1_150_000 in 4dp units → crosses 1.0 alert unit
    assert got[1].n_events == 2 and got[1].sum_value_4dp == 1_150_000
    assert got[1].last_event_id == 11 and got[1].budget_alerts == 1
    assert got[2].n_events == 1 and got[2].budget_alerts == 0

    # second batch: state carries across restarts from the checkpoint
    _write(ev_dir, "b1.json", [
        {"user_id": 1, "event_id": 12, "ts": "2024-01-01T00:05:00.000Z", "value": 100.0},
    ])
    got2 = run("ckpt_tws")
    assert got2[1].n_events == 3 and got2[1].sum_value_4dp == 2_150_000
    assert got2[1].last_event_id == 12 and got2[1].budget_alerts == 2
    assert 2 not in got2
