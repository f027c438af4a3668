"""Unit tests: built-in session_window semantics pin and the
cogroup/pandas merge_asof parity with the JVM as-of join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.asof import (
    asof_join,
    asof_join_pandas,
)


def test_session_window_merges_boundary_event(spark):
    # event at exactly prev + gap MERGES (same semantics as
    # operators.sessions: new session only when gap strictly exceeded)
    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0)), (1, datetime(2024, 1, 1, 0, 30))],
        ["u", "ts"],
    )
    out = df.groupBy("u", F.session_window("ts", "30 minutes")).count().collect()
    assert len(out) == 1 and out[0]["count"] == 2
    assert out[0]["session_window"]["end"] == datetime(2024, 1, 1, 1, 0)


def _fixture(spark):
    t = lambda m: datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, 100, t(5)), (2, 100, t(10)), (3, 100, t(1)), (4, 200, t(7)), (5, 300, t(9))],
        ["fact_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [(10, 100, t(2), "a"), (11, 100, t(5), "b"), (12, 100, t(5), "c"),
         (13, 200, t(8), "d")],
        ["rid", "k", "ts", "state"],
    )
    return left, right


def test_cogroup_pandas_asof_matches_jvm_asof(spark):
    left, right = _fixture(spark)
    jvm = asof_join(
        left, right, "k", right_cols=["state", "rid"], tiebreak="rid"
    ).orderBy("fact_id")
    pdp = asof_join_pandas(
        left, right, "k", right_cols=["state", "rid"], tiebreak="rid"
    ).orderBy("fact_id")
    assert jvm.columns == pdp.columns
    assert [r.asDict() for r in jvm.collect()] == [r.asDict() for r in pdp.collect()]


def test_cogroup_pandas_asof_tiebreak_and_nulls(spark):
    left, right = _fixture(spark)
    got = {r.fact_id: r for r in asof_join_pandas(
        left, right, "k", right_cols=["state", "rid"], tiebreak="rid"
    ).collect()}
    assert got[1].asof_state == "c"   # tie at t5: max-rid right row wins
    assert got[3].asof_state is None  # before any right row
    assert got[4].asof_state is None  # right row for k=200 is later
    assert got[5].asof_state is None  # key with no right rows at all
