"""Canary pinning the lake's event-time type semantics.

Round-2 postmortem: a Spark default (parquet NTZ inference) silently
decided the read type of ``events.ts``, and ``withWatermark`` rejects
TIMESTAMP_NTZ — breaking every streaming query only under the driver's
vanilla session. These tests make that class of env-upgrade breakage a
unit-test failure instead of a driver-run surprise.
"""

from __future__ import annotations

from pyspark.sql import types as T

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
    load_table,
)


def test_events_ts_reads_as_ntz(spark, sf_dir):
    """The pinned conf makes events.ts TIMESTAMP_NTZ — the type every
    oracle's epoch-us conversion was validated against."""
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType), (
        "events.ts no longer reads as TIMESTAMP_NTZ — parquet timestamp "
        "inference changed; re-audit every epoch_us/windowing oracle"
    )


def test_load_table_reasserts_confs_on_vanilla_session(spark, sf_dir):
    """load_table must repair correctness-critical confs even if a
    caller (the verification driver) clobbered them."""
    originals = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.session.timeZone",
            "spark.sql.parquet.inferTimestampNTZ.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Bangkok")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        load_table(spark, sf_dir, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert (
            spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
            == "true"
        )
    finally:
        for k, v in originals.items():
            spark.conf.set(k, v)


def test_windowed_counts_once_handles_ntz_event_time(spark, sf_dir):
    """The streaming path must watermark NTZ event time (cast through
    TIMESTAMP, value-identical under the pinned UTC session) and emit
    NTZ window bounds for batch-schema parity."""
    import os

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.windowed import (
        windowed_counts_once,
    )

    out = windowed_counts_once(
        spark, os.path.join(sf_dir, "events.parquet"), duration="6 hours"
    )
    assert isinstance(out.schema["window_start"].dataType, T.TimestampNTZType)
    assert isinstance(out.schema["window_end"].dataType, T.TimestampNTZType)
    assert out.count() > 0
