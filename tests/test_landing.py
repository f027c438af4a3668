"""Landed-response → raw-zone batch job (S1/S2 lifecycle)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.landing import (
    land_batch,
)


def test_land_batch_splits_fresh_known_stale_unknown(spark, tmp_path):
    ts = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    landed = spark.createDataFrame(
        [
            (1, ts(10), 0, 1.5),    # fresh, known place
            (2, ts(10), 1, 2.5),    # fresh, known place
            (3, ts(3), 0, 9.9),     # stale
            (4, ts(10), 99, 7.7),   # fresh, unknown place -> DLQ
            (5, None, 0, 0.1),      # unparseable timestamp -> DLQ
        ],
        "obs_id long, obs_ts timestamp, place_key long, value double",
    )
    places = spark.createDataFrame(
        [(0, "alpha"), (1, "beta")], "place_key long, place_name string"
    )
    raw = str(tmp_path / "raw")
    dlq = str(tmp_path / "dlq")
    land_batch(
        landed, places, "place_key", "obs_ts",
        F.col("obs_ts") >= ts(10), raw, dlq_path=dlq,
    )

    back = spark.read.parquet(raw)
    rows = {r.obs_id: r for r in back.collect()}
    assert set(rows) == {1, 2}
    assert rows[1].place_name == "alpha" and rows[2].place_name == "beta"
    # hive partition key present and hour-granular
    assert str(rows[1].obs_hour) == "2024010110"
    # partition directory exists -> downstream hourly jobs prune by path
    assert any("obs_hour=2024010110" in d for d in os.listdir(raw))

    rejects = {r.obs_id: r.reject_reason for r in spark.read.json(dlq).collect()}
    assert rejects == {
        3: "stale_or_unparseable_timestamp",
        4: "unknown_place:place_key",
        5: "stale_or_unparseable_timestamp",
    }
