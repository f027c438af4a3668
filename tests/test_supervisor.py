"""T8 restart semantics e2e: a crashed CDC stream is resubmitted by the
supervisor, the checkpoint replays the in-flight batch, and the
idempotent merge leaves the target exactly as a crash-free run would."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.errors import StreamingQueryException

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import schemas
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.cdc_merge import (
    apply_cdc_batch,
    read_target,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.supervisor import (
    supervise,
)

from tests.test_streaming_cdc import _doc, _event, _write_events, places_dim  # noqa: F401


def _crashy_cdc_query(spark, events_dir, target, dim, dlq, ckpt, crash_flag):
    """start_cdc_stream, but the foreachBatch body crashes once — AFTER
    its side effects (the worst case for idempotence) — whenever the
    crash flag file exists. The flag is consumed by the crash, so the
    supervisor's resubmission succeeds."""

    def body(batch_df, batch_id):
        apply_cdc_batch(batch_df, batch_id, target, dim, dlq)
        if os.path.exists(crash_flag):
            os.remove(crash_flag)
            raise RuntimeError("injected crash after side effects")

    def start():
        stream = spark.readStream.schema(schemas.CDC_EVENT).json(events_dir)
        return (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    return start


def test_supervisor_restarts_crashed_stream_and_merge_is_idempotent(
    spark, tmp_path, places_dim  # noqa: F811
):
    events_dir = str(tmp_path / "events")
    target = str(tmp_path / "target")
    dlq = str(tmp_path / "dlq")
    ckpt = str(tmp_path / "ckpt")
    crash_flag = str(tmp_path / "crash.flag")

    _write_events(
        events_dir,
        [
            _event("insert", _doc("a", "hanoi", 20.0)),
            _event("insert", _doc("b", "hue", 25.0)),
            _event("insert", _doc("c", "hanoi", 30.0)),
        ],
    )
    open(crash_flag, "w").close()

    alerts: list[str] = []
    naps: list[float] = []
    result = supervise(
        _crashy_cdc_query(
            spark, events_dir, target, places_dim, dlq, ckpt, crash_flag
        ),
        max_restarts=3,
        backoff_s=0.01,
        on_alert=alerts.append,
        sleep=naps.append,
    )

    # one crash, one alert, one backoff nap, then success
    assert result == {"attempts": 2, "restarts": 1, "succeeded": True}
    assert len(alerts) == 1 and "injected crash" in alerts[0]
    assert naps == [0.01]

    # attempt 1 APPENDED all three rows before crashing; the replayed
    # batch must be a no-op (PK anti-join), not a duplicate append
    rows = read_target(spark, target).select("id", "temp_c").collect()
    assert sorted((r["id"], r["temp_c"]) for r in rows) == [
        ("a", 20.0), ("b", 25.0), ("c", 30.0),
    ]


def test_supervisor_gives_up_after_max_restarts(
    spark, tmp_path, places_dim  # noqa: F811
):
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    _write_events(events_dir, [_event("insert", _doc("a", "hanoi"))])

    def body(batch_df, batch_id):
        raise RuntimeError("permanent poison")

    def start():
        stream = spark.readStream.schema(schemas.CDC_EVENT).json(events_dir)
        return (
            stream.writeStream.foreachBatch(body)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    alerts: list[str] = []
    with pytest.raises(StreamingQueryException):
        supervise(
            start, max_restarts=2, backoff_s=0.01, on_alert=alerts.append,
            sleep=lambda _s: None,
        )
    # alerted on every failure: initial run + 2 restarts
    assert len(alerts) == 3
