"""Round-10 pins: CDC multi-update LWW determinism, the full-replay
operator's guards, and the unbounded-aggregation-buffer plan lint."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import schemas
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.cdc_merge import (
    read_target,
    start_cdc_stream,
)


def _doc(_id, place_id, temp_c=20.0, last_updated="2023-11-14 15:00"):
    return {
        "_id": _id,
        "place_id": place_id,
        "location": None,
        "current": {
            "last_updated_epoch": 1700000000,
            "last_updated": last_updated,
            "temp_c": temp_c, "temp_f": temp_c * 1.8 + 32,
            "is_day": 1,
            "condition": {"text": "Sunny", "icon": "i", "code": 1000},
            "wind_mph": 5.0, "wind_kph": 8.0, "wind_degree": 90,
            "wind_dir": "E", "pressure_mb": 1010.0, "pressure_in": 29.8,
            "precip_mm": 0.0, "precip_in": 0.0, "humidity": 60, "cloud": 10,
            "feelslike_c": 21.0, "feelslike_f": 70.0, "vis_km": 10.0,
            "vis_miles": 6.0, "uv": 5.0, "gust_mph": 7.0, "gust_kph": 11.0,
        },
    }


def _event(op, doc=None, key=None, ts="2023-11-14T15:00:00.000Z"):
    return {
        "operation_type": op,
        "ns_db": "lake",
        "ns_coll": "weather",
        "full_document": doc,
        "document_key": key,
        "ts": ts,
    }


@pytest.fixture()
def places_dim(spark):
    return spark.createDataFrame(
        [("hanoi", None, None, "VN", "21.0N", "105.8E", "Hanoi", None, None)],
        schemas.PLACES_DIM,
    )


def test_two_updates_to_one_key_in_one_batch_pick_the_later_post_image(
    spark, places_dim, tmp_path
):
    """Regression pin for the round-10 LWW fix: the update path used to
    re-join flattened post-images to event timestamps BY ID ALONE, so a
    batch with two updates to one key cross-paired the EARLIER
    post-image with the LATER timestamp and the row_number pick among
    the resulting ts-ties was partition-order-nondeterministic. With ts
    carried THROUGH the flatten projection the pairing is row-accurate
    and the later post-image must always win."""
    events_dir = str(tmp_path / "events")
    target = str(tmp_path / "fact")
    dlq = str(tmp_path / "dlq")
    events = [
        _event("insert", doc=_doc("w1", "hanoi", 20.0)),
        _event("update", doc=_doc("w1", "hanoi", 50.0), key="w1",
               ts="2023-11-14T16:00:00.000Z"),
        _event("update", doc=_doc("w1", "hanoi", 99.0), key="w1",
               ts="2023-11-14T17:00:00.000Z"),
    ]
    os.makedirs(events_dir, exist_ok=True)
    with open(os.path.join(events_dir, "batch0.json"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    q = start_cdc_stream(
        spark, events_dir, target, places_dim, dlq, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    fact = read_target(spark, target)
    rows = fact.collect()
    assert len(rows) == 1
    assert rows[0].id == "w1"
    assert rows[0].temp_c == 99.0  # the 17:00 post-image, never the 16:00 one


def test_cdc_merge_replay_guards_batch_structure(spark, places_dim):
    """cdc_merge_replay must map phase i → micro-batch i (count- and
    path-guarded) and thread cross-batch state through the target: a
    phase-2 update overrides a phase-1 insert."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.cdc_merge import (
        cdc_merge_replay,
    )

    import datetime as dt

    t0 = dt.datetime(2023, 11, 14, 15, 0, 0)
    p1 = spark.createDataFrame(
        [_event("insert", doc=_doc("w1", "hanoi", 20.0), ts=t0),
         _event("insert", doc=_doc("w2", "hanoi", 25.0), ts=t0)],
        schemas.CDC_EVENT,
    )
    p2 = spark.createDataFrame(
        [_event("update", doc=_doc("w1", "hanoi", 70.0), key="w1",
                ts=t0 + dt.timedelta(hours=1))],
        schemas.CDC_EVENT,
    )
    fact, dlq_fk, dlq_unknown = cdc_merge_replay(spark, [p1, p2], places_dim)
    got = {r.id: r.temp_c for r in fact.collect()}
    assert got == {"w1": 70.0, "w2": 25.0}
    assert dlq_fk.count() == 0
    assert dlq_unknown.count() == 0


def test_cdc_merge_restart_skips_committed_file_and_redelivers_rejects(
    spark, places_dim, tmp_path
):
    """Restart semantics: run 2 must consume ONLY the phase-2 file
    (restored offsets), redelivered landed inserts are suppressed by
    the PK anti-join, and redelivered FK-REJECTED inserts reject a
    second time (they never landed, so there is no state to suppress
    them — the append-only DLQ makes exactly-once admission
    observable)."""
    import datetime as dt

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.cdc_merge import (
        cdc_merge_restart,
    )

    t0 = dt.datetime(2023, 11, 14, 15, 0, 0)
    ins_ok = _event("insert", doc=_doc("w1", "hanoi", 20.0), ts=t0)
    ins_orphan = _event("insert", doc=_doc("w3", "nowhere", 30.0), ts=t0)
    p1 = spark.createDataFrame([ins_ok, ins_orphan], schemas.CDC_EVENT)
    p2 = spark.createDataFrame(
        [ins_ok, ins_orphan,  # redelivered across the restart
         _event("update", doc=_doc("w1", "hanoi", 80.0), key="w1",
                ts=t0 + dt.timedelta(hours=1))],
        schemas.CDC_EVENT,
    )
    fact, dlq_fk, dlq_unknown = cdc_merge_restart(spark, p1, p2, places_dim)
    got = {r.id: r.temp_c for r in fact.collect()}
    assert got == {"w1": 80.0}  # redelivered w1 suppressed, update applied
    rejects = sorted((r._id, r.batch_id) for r in dlq_fk.collect())
    # w3 rejected in batch 0 AND again on redelivery in batch 1
    assert rejects == [("w3", 0), ("w3", 1)]
    assert dlq_unknown.count() == 0


def test_rocksdb_provider_engages_and_conf_is_restored(spark, tmp_path):
    """windowed_counts_once_rocksdb must (a) actually run on the
    RocksDB state store (it asserts rocksdb* custom metrics itself —
    a silently ignored conf raises), (b) restore the provider conf,
    and (c) return the same windows the default provider computes —
    the provider is physical layout, not semantics."""
    import datetime as dt

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.windowed import (
        windowed_counts_once,
        windowed_counts_once_rocksdb,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 10), "click"),
        (2, dt.datetime(2024, 1, 1, 0, 50), "click"),
        (3, dt.datetime(2024, 1, 1, 1, 5), "view"),
    ]
    path = str(tmp_path / "ev.parquet")
    spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string") \
        .coalesce(1).write.parquet(path)

    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        before = spark.conf.get(key)
    except Exception:
        before = None

    kw = dict(duration="1 hour", group_cols=["event_type"])
    a = {(r.window_start, r.event_type): r.n_events
         for r in windowed_counts_once_rocksdb(spark, path, **kw).collect()}
    b = {(r.window_start, r.event_type): r.n_events
         for r in windowed_counts_once(spark, path, **kw).collect()}
    assert a == b and len(a) == 2

    try:
        after = spark.conf.get(key)
    except Exception:
        after = None
    assert after == before  # conf restored


def test_unbounded_agg_buffer_lint_flags_synthetic_violator(spark):
    """The executed-plan lint must flag an exact percentile over a
    low-cardinality key on a fact-sized input (the winsorize class) and
    must NOT flag accuracy-bounded approx aggregates or small-ratio
    collects."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.explain import (
        count_unbounded_agg_buffers,
    )

    df = spark.range(50000).select(
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    bad = df.groupBy("g").agg(F.percentile("v", F.lit(0.5)).alias("p50"))
    bad.collect()
    assert count_unbounded_agg_buffers(bad) >= 1

    approx = df.groupBy("g").agg(F.percentile_approx("v", 0.5).alias("p50"))
    approx.collect()
    assert count_unbounded_agg_buffers(approx) == 0

    small = (
        spark.range(50000)
        .select((F.col("id") % 10000).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.collect_list("v").alias("xs"))
        .select("k", F.size("xs").alias("n"))
    )
    small.collect()
    assert count_unbounded_agg_buffers(small) == 0


def test_dynamic_gap_session_merges_at_exact_boundary(spark):
    """Boundary pin for the dynamic-gap session oracle
    (`dynamic_gap_sessions`): an event starting EXACTLY at the running
    session end MERGES (end extends), one microsecond past breaks —
    i.e. the oracle's break rule is strictly `start > max(prev ends)`.
    Empirically probed against Spark 4's session_window with a CASE
    gap; if Spark ever flips to end-exclusive merge this fails before
    the driver hash does."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, "view"),                             # gap 15 min → end 00:15
        (1, t0 + dt.timedelta(minutes=15), "view"),  # starts EXACTLY at end
        (2, t0, "view"),
        (2, t0 + dt.timedelta(minutes=15, microseconds=1), "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    gap = F.when(F.col("event_type") == "click", F.lit("40 minutes")).otherwise(
        F.lit("15 minutes")
    )
    out = df.groupBy("user_id", F.session_window("ts", gap)).agg(
        F.count(F.lit(1)).alias("n")
    )
    got = {
        (r.user_id, r["session_window"]["start"].isoformat(), r.n)
        for r in out.collect()
    }
    assert got == {
        (1, "2024-01-01T00:00:00", 2),                 # merged, one session
        (2, "2024-01-01T00:00:00", 1),                 # split, two sessions
        (2, "2024-01-01T00:15:00.000001", 1),
    }


def test_aqe_splits_skewed_join_at_runtime(spark):
    """Runtime pin for AQE's skew-join split (the complement of the
    deterministic salted join in operators/skew.py): a sort-merge join
    whose left side piles 75% of its rows onto one key must execute
    with the skewed partition SPLIT (SortMergeJoin(skew=true) in the
    final adaptive plan) once the skew thresholds are in reach — the
    no-reshuffle runtime remedy a 1000-executor cluster relies on when
    a hot key appears in data the planner didn't predict."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.explain import (
        physical_plan,
    )

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    }
    prev: dict = {}
    for k in confs:
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(400_000).select(
            F.when(F.col("id") % 4 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").groupBy().count()
        [row] = j.collect()
        # key 0 matches right row 0: 300k join hits + the k%4 survivors
        # that land inside right's 0..999 id range
        assert row["count"] > 300_000
        assert "skew=true" in physical_plan(j)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# Domain-bounded buffering aggregates the round-10 audit adjudicated:
# per-group buffer size is a SCHEMA constant (per-order lines ≤ 7,
# |event_types| mode counters, |types × hours| maps, per-doc shingle
# ranks, per-contracted-node label sets, capped postings slices), so
# the buffer does not grow with data volume even where the runtime
# rows-per-group ratio trips the lint. Closed set — a NEW query whose
# plan flags must either migrate to the grouped_* order-statistics
# operators or argue its bound here.
UNBOUNDED_BUFFER_ALLOWLIST = {
    # mode() per user: the buffer is an |event_types|-entry count map
    # (~5 keys, a schema constant), not the user's event rows — the
    # runtime ratio trips the lint because events/user > 64, but the
    # buffer does not grow with data volume
    "user_modal_event",
    # collect_list over the PRE-AGGREGATED hourly table: one group
    # holds ≤ |distinct hours in the window| entries — time-domain-
    # bounded, not event-volume-dependent (the events were already
    # reduced to (type, hour, count) rows before the collect)
    "map_functions",
}


def test_registry_unbounded_buffer_allowlist_is_closed(spark):
    """Every registry query whose executed plan trips the
    unbounded-buffer lint must be on the adjudicated allowlist. The
    full sweep lives in SCALE.md (tools/plan_report.py); this test
    pins the queries that were known buffering-aggregate users, so the
    suite fails fast if one regresses."""
    import __spark_entry__ as entrymod
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.explain import (
        count_unbounded_agg_buffers,
    )

    # the historical buffering-aggregate users plus the r9/r10 rebuilds
    # (the r10 full-registry sweep in SCALE.md flags exactly
    # {user_modal_event, map_functions} — both allowlisted above)
    watch = [
        "value_winsorized", "value_percentiles", "mad_by_type",
        "approx_quantile_check", "percentile_cont_parity",
        "brands_listagg", "user_modal_event", "nested_rebuild_roundtrip",
        "map_functions",
    ]
    qs = entrymod.queries()
    sf = "/root/testdata/sf0.01"
    for name in watch:
        df = qs[name](spark, sf)
        df.collect()
        flags = count_unbounded_agg_buffers(df)
        if name in UNBOUNDED_BUFFER_ALLOWLIST:
            continue
        assert flags == 0, (
            f"{name}: {flags} unbounded aggregation buffer(s) in the "
            "executed plan — migrate to grouped_percentile_exact/"
            "grouped_rank or adjudicate into UNBOUNDED_BUFFER_ALLOWLIST"
        )
