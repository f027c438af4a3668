"""Unit tests: point-in-time SCD2 join and snapshot diff."""

from __future__ import annotations

from datetime import datetime

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.asof import (
    point_in_time_join,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.diff import (
    snapshot_diff,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.scd import (
    scd2_history,
)


def _t(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_pit_join_picks_version_valid_at_fact_time(spark):
    obs = [
        (1, 100, _t(0), "bronze"),
        (2, 100, _t(6), "silver"),
        (3, 100, _t(12), "gold"),
    ]
    hist = scd2_history(
        spark.createDataFrame(obs, ["event_id", "user_id", "ts", "tier"]),
        "user_id", "ts", ["tier"], tiebreak_col="event_id",
    )
    facts = spark.createDataFrame(
        [(10, 100, _t(5, 59)), (11, 100, _t(6)), (12, 100, _t(23))],
        ["fact_id", "user_id", "ts"],
    )
    got = {r.fact_id: r.asof_tier for r in point_in_time_join(facts, hist, "user_id").collect()}
    assert got == {10: "bronze", 11: "silver", 12: "gold"}


def test_pit_join_fact_before_history_gets_null(spark):
    hist = scd2_history(
        spark.createDataFrame([(1, 100, _t(12), "gold")], ["event_id", "user_id", "ts", "tier"]),
        "user_id", "ts", ["tier"], tiebreak_col="event_id",
    )
    facts = spark.createDataFrame([(10, 100, _t(1))], ["fact_id", "user_id", "ts"])
    [row] = point_in_time_join(facts, hist, "user_id").collect()
    assert row.asof_tier is None and row.asof_valid_from is None


def test_pit_join_simultaneous_versions_pick_nonempty_interval(spark):
    # two versions open at the same instant: [t6,t6) is empty, the
    # surviving interval is the max-tiebreak one
    obs = [
        (1, 100, _t(0), "bronze"),
        (2, 100, _t(6), "silver"),
        (3, 100, _t(6), "gold"),
    ]
    hist = scd2_history(
        spark.createDataFrame(obs, ["event_id", "user_id", "ts", "tier"]),
        "user_id", "ts", ["tier"], tiebreak_col="event_id",
    )
    facts = spark.createDataFrame([(10, 100, _t(6))], ["fact_id", "user_id", "ts"])
    [row] = point_in_time_join(facts, hist, "user_id").collect()
    assert row.asof_tier == "gold"


def test_snapshot_diff_classifies_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "seg", "bal"]
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", 30.0), (4, "d", 40.0)], ["k", "seg", "bal"]
    )
    got = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(got) == {1, 2, 4}  # 3 is unchanged, excluded
    assert got[1].change_type == "removed" and got[1].new_bal is None
    assert got[2].change_type == "changed" and (got[2].old_bal, got[2].new_bal) == (20.0, 25.0)
    assert got[4].change_type == "added" and got[4].old_bal is None

    with_unchanged = snapshot_diff(old, new, ["k"], include_unchanged=True)
    assert {r.k: r.change_type for r in with_unchanged.collect()}[3] == "unchanged"


def test_snapshot_diff_null_safe_compare(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "k int, v string")
    new = spark.createDataFrame([(1, None), (2, "x")], "k int, v string")
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"], include_unchanged=True).collect()}
    assert got == {1: "unchanged", 2: "changed"}
