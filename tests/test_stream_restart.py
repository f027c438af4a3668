"""Checkpoint-restart streaming replay: advancing-watermark semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
    load_table,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.windowed import (
    restart_append_counts,
)


def test_restart_replay_drops_late_rows_and_matches_emission_rule(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    out, stats = restart_append_counts(
        spark,
        phase1=e.filter(F.col("user_id") % 2 == 0),
        phase2=e.filter(F.col("user_id") % 2 != 0),
        duration="1 hour",
        lateness="30 minutes",
        group_cols=["event_type"],
    )
    # the restart is only a meaningful test if the watermark genuinely
    # advanced between phases: phase 2 must have late-dropped rows
    # (odd-user events in hours already closed by W1)
    assert stats["phase1"]["data_batches"] == 1
    assert stats["phase2"]["data_batches"] == 1
    assert stats["phase1"]["rows_dropped"] == 0
    assert stats["phase2"]["rows_dropped"] > 0

    rows = {(r["window_start"], r["event_type"]): r["n_events"] for r in out.collect()}
    # replay the emission rule in batch: W1/W2 ms-truncated
    mx1 = e.filter(F.col("user_id") % 2 == 0).agg(F.max("ts")).first()[0]
    mx2 = e.agg(F.max("ts")).first()[0]

    def floor_ms_minus_30m(ts):
        import datetime

        us = int(ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        return (us // 1000) * 1000 - 30 * 60 * 1_000_000

    w1, w2 = floor_ms_minus_30m(mx1), floor_ms_minus_30m(mx2)
    import collections
    import datetime

    exp = collections.Counter()
    for r in e.select("ts", "user_id", "event_type").collect():
        us = int(
            r["ts"].replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
        )
        hour_start = (us // 3_600_000_000) * 3_600_000_000
        hour_end = hour_start + 3_600_000_000
        if r["user_id"] % 2 != 0 and hour_end <= w1:
            continue  # late-dropped in phase 2
        if hour_end <= w2:
            exp[
                (
                    datetime.datetime.fromtimestamp(
                        hour_start / 1_000_000, tz=datetime.timezone.utc
                    ).replace(tzinfo=None),
                    r["event_type"],
                )
            ] += 1
    assert rows == dict(exp)
    # dropped-row accounting closes the books: emitted + withheld
    # (open windows) + dropped == total
    n_emitted = sum(rows.values())
    n_total = e.count()
    assert n_emitted + stats["phase2"]["rows_dropped"] <= n_total


def test_rocksdb_state_store_matches_default_provider(spark, sf_dir):
    """The 100 TB streaming-state backend: RocksDB state store
    (rocksdbjni ships with Spark) must produce byte-identical windowed
    aggregates to the default HDFS-backed store. At scale RocksDB is
    the difference between state bounded by executor heap and state
    bounded by local disk; here we pin provider-swap correctness."""
    import os

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.windowed import (
        windowed_counts_once,
    )

    path = os.path.join(sf_dir, "events.parquet")
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key)
    baseline = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in windowed_counts_once(
            spark, path, group_cols=["event_type"]
        ).collect()
    }
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        rocks = {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in windowed_counts_once(
                spark, path, group_cols=["event_type"]
            ).collect()
        }
    finally:
        spark.conf.set(key, prev)
    assert rocks == baseline and len(rocks) > 0


def test_chained_stateful_propagates_watermark_minus_horizon(spark, tmp_path):
    """The SPARK-42376 rule the stream_join_then_window oracle encodes:
    after a time-interval join, the downstream window aggregation's
    effective watermark is W − horizon, NOT W. 15-minute windows over
    a dense synthetic stream discriminate the two cuts (hour-coarse
    real data cannot)."""
    import datetime
    import os

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.joins import (
        chained_join_window_once,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for m in range(0, 24 * 60, 10):
        t = base + datetime.timedelta(minutes=m)
        rows.append((eid, t, 1, "click", 1.0))
        eid += 1
        rows.append((eid, t + datetime.timedelta(minutes=5), 1, "purchase", 2.0))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    p = os.path.join(str(tmp_path), "ev")
    df.coalesce(1).write.parquet(p)
    out = chained_join_window_once(spark, p, duration="15 minutes")
    last = max(r["window_start"] for r in out.collect())
    # max ts 23:55 → W = 21:55; cut at W − 30m = 21:25 admits end
    # 21:15 (start 21:00) and withholds end 21:30 — a plain W cut
    # would admit start 21:30
    assert last == datetime.datetime(2024, 1, 1, 21, 0)
