"""Unit tests for the core operator library (SURVEY.md §5 invariants).

Mirrors the reference's operational correctness checks as test
invariants: idempotence, FK integrity, dedup, reconciliation, flatten
schema parity with the warehouse DDL.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import schemas
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.functions.cleaning import (
    parse_minute_timestamp,
    strip_direction_suffix,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators import (
    dedup_against_target,
    duplicate_audit,
    exact_dedup,
    fk_filter,
    fk_violations,
    flatten_weather,
    last_write_wins,
    new_rows_only,
    reconcile_counts,
    upsert,
)


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_new_rows_only_is_idempotent_insert(spark):
    batch = _df(spark, [("a", 1), ("b", 2), ("c", 3)], ["id", "v"])
    target = _df(spark, [("a", 1)], ["id", "v"])
    fresh = new_rows_only(batch, target, "id")
    assert sorted(r.id for r in fresh.collect()) == ["b", "c"]
    # appending fresh then re-running yields nothing new (effectively-once)
    again = new_rows_only(batch, target.union(fresh), "id")
    assert again.count() == 0


def test_fk_filter_and_violations_partition_input(spark):
    fact = _df(spark, [("x", "p1"), ("y", "p2"), ("z", "p9")], ["id", "place_id"])
    dim = _df(spark, [("p1",), ("p2",)], ["place_id"])
    ok = fk_filter(fact, dim, "place_id")
    bad = fk_violations(fact, dim, "place_id")
    assert sorted(r.id for r in ok.collect()) == ["x", "y"]
    assert [r.id for r in bad.collect()] == ["z"]
    assert ok.count() + bad.count() == fact.count()


def test_dedup_against_target_in_batch_and_cross(spark):
    batch = _df(spark, [("a", 1), ("a", 2), ("b", 1), ("c", 1)], ["k", "v"])
    target = _df(spark, [("c", 9)], ["k", "v"])
    out = dedup_against_target(batch, target, "k")
    assert sorted(r.k for r in out.collect()) == ["a", "b"]


def test_duplicate_audit(spark):
    df = _df(spark, [("a",), ("a",), ("b",), ("a",)], ["k"])
    audit = duplicate_audit(df, "k").collect()
    assert len(audit) == 1 and audit[0].k == "a" and audit[0].occurrences == 3


def test_exact_dedup_keeps_min_order_key(spark):
    df = _df(
        spark,
        [(3, "same text"), (1, "same text"), (2, "other")],
        ["doc_id", "text"],
    )
    out = exact_dedup(df, ["text"], "doc_id")
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 2]


def test_last_write_wins_and_upsert_idempotent(spark):
    target = _df(spark, [("a", 1, 10), ("b", 1, 20)], ["id", "ver", "v"])
    updates = _df(
        spark, [("a", 2, 11), ("a", 3, 12), ("c", 1, 30)], ["id", "ver", "v"]
    )
    merged = upsert(target, updates, "id", version_col="ver")
    rows = {r.id: (r.ver, r.v) for r in merged.collect()}
    assert rows == {"a": (3, 12), "b": (1, 20), "c": (1, 30)}
    # idempotence: re-applying the same batch changes nothing
    merged2 = upsert(merged, updates, "id", version_col="ver")
    assert {r.id: (r.ver, r.v) for r in merged2.collect()} == rows
    # last_write_wins alone
    lww = last_write_wins(updates, "id", "ver")
    assert {r.id: r.ver for r in lww.collect()} == {"a": 3, "c": 1}


def test_reconcile_counts(spark):
    src = _df(spark, [("a",), ("b",), ("c",)], ["id"])
    tgt = _df(spark, [("a",), ("b",)], ["id"])
    rec = reconcile_counts(src, tgt, "id").collect()[0]
    assert rec.source_rows == 3 and rec.target_rows == 2
    assert rec.missing_in_target == 1 and rec.extra_in_target == 0
    assert not rec.consistent
    rec2 = reconcile_counts(src, src, "id").collect()[0]
    assert rec2.consistent


def test_flatten_weather_matches_warehouse_ddl(spark):
    """Flatten output schema == create_tables.sql:15-41 (25 columns)."""
    row = {
        "_id": "oid1",
        "place_id": "hanoi",
        "location": None,
        "current": {
            "last_updated_epoch": 1700000000,
            "last_updated": "2023-11-14 15:00",
            "temp_c": 25.0, "temp_f": 77.0,
            "is_day": 1,
            "condition": {"text": "Sunny", "icon": "i", "code": 1000},
            "wind_mph": 5.0, "wind_kph": 8.0, "wind_degree": 90,
            "wind_dir": "E", "pressure_mb": 1010.0, "pressure_in": 29.8,
            "precip_mm": 0.0, "precip_in": 0.0, "humidity": 60, "cloud": 10,
            "feelslike_c": 26.0, "feelslike_f": 79.0, "vis_km": 10.0,
            "vis_miles": 6.0, "uv": 5.0, "gust_mph": 7.0, "gust_kph": 11.0,
        },
    }
    raw = spark.createDataFrame([row], schemas.WEATHER_RAW)
    flat = flatten_weather(raw)
    assert len(flat.columns) == 25
    got = dict(flat.dtypes)
    assert got["id"] == "string"
    assert got["is_day"] == "boolean"
    assert got["condition"] == "string"
    assert got["last_updated"] == "timestamp"
    r = flat.collect()[0]
    assert r.id == "oid1" and r.condition == "Sunny" and r.is_day is True
    assert r.last_updated == dt.datetime(2023, 11, 14, 15, 0, 0)


def test_strip_direction_suffix(spark):
    df = _df(spark, [("21.0245N",), ("105.84117E",), ("7.5",)], ["lat"])
    vals = [r.v for r in df.select(strip_direction_suffix("lat").alias("v")).collect()]
    assert vals == [21.0245, 105.84117, 7.5]


def test_parse_minute_timestamp(spark):
    df = _df(spark, [("2023-11-14 15:30",)], ["s"])
    v = df.select(parse_minute_timestamp("s").alias("t")).collect()[0].t
    assert v == dt.datetime(2023, 11, 14, 15, 30, 0)


def test_null_key_semantics_match_sql(spark):
    """NULL keys never equal anything: anti-join keeps them (SQL NOT
    EXISTS semantics), semi-join drops them — pinned so the oracle
    comparison can't diverge on null-keyed rows."""
    batch = spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3)], "id string, v int"
    )
    target = spark.createDataFrame([("a", 9), (None, 8)], "id string, v int")
    kept = new_rows_only(batch, target, "id")
    got = sorted(((r.id, r.v) for r in kept.collect()), key=str)
    assert got == sorted([(None, 2), ("b", 3)], key=str)
    ok = fk_filter(batch, target.select("id"), "id")
    assert [r.v for r in ok.collect()] == [1]


def test_json_lake_roundtrip(spark, tmp_path):
    """Raw-zone JSON round-trip with the nested weather schema (the
    reference's document shape survives write→schema-read intact)."""
    import os

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import schemas
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
        load_json_table,
    )

    row = {
        "_id": "x1", "place_id": "hanoi", "location": None,
        "current": {
            "last_updated_epoch": 1, "last_updated": "2023-11-14 15:00",
            "temp_c": 25.0, "temp_f": 77.0, "is_day": 1,
            "condition": {"text": "Sunny", "icon": "i", "code": 1000},
            "wind_mph": 5.0, "wind_kph": 8.0, "wind_degree": 90,
            "wind_dir": "E", "pressure_mb": 1010.0, "pressure_in": 29.8,
            "precip_mm": 0.0, "precip_in": 0.0, "humidity": 60, "cloud": 10,
            "feelslike_c": 26.0, "feelslike_f": 79.0, "vis_km": 10.0,
            "vis_miles": 6.0, "uv": 5.0, "gust_mph": 7.0, "gust_kph": 11.0,
        },
    }
    df = spark.createDataFrame([row], schemas.WEATHER_RAW)
    out = str(tmp_path / "raw_json")
    df.write.mode("overwrite").json(out)
    back = load_json_table(spark, out, schemas.WEATHER_RAW)
    # names/types round-trip exactly; nullability is relaxed by the
    # JSON reader (every JSON field may be absent), so compare typed
    # structure, not nullable flags
    assert back.schema.simpleString() == schemas.WEATHER_RAW.simpleString()
    r = back.collect()[0]
    assert r._id == "x1" and r.current.condition.text == "Sunny"
