"""Unit tests: as-of join and sessionization operators."""

from __future__ import annotations

import datetime as dt

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.asof import (
    asof_join,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.sessions import (
    sessionize,
)


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute, 0)


def test_asof_join_backward_semantics(spark):
    trades = spark.createDataFrame(
        [("A", _ts(10), 100), ("A", _ts(20), 101), ("B", _ts(15), 200)],
        "sym string, ts timestamp, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", _ts(9), 9.0), ("A", _ts(10), 10.0), ("A", _ts(19), 19.0),
         ("B", _ts(16), 99.0)],
        "sym string, ts timestamp, px double",
    )
    out = {r.trade_id: r for r in asof_join(trades, quotes, "sym", right_cols=["px"]).collect()}
    assert out[100].asof_px == 10.0       # equal-ts quote is visible (<=)
    assert out[101].asof_px == 19.0       # most recent prior
    assert out[200].asof_px is None       # no prior quote for B
    assert out[100].asof_ts == _ts(10)


def test_asof_join_tiebreak_latest_wins(spark):
    left = spark.createDataFrame([("A", _ts(10), 1)], "k string, ts timestamp, lid long")
    right = spark.createDataFrame(
        [("A", _ts(5), 7), ("A", _ts(5), 9)], "k string, ts timestamp, rid long"
    )
    out = asof_join(left, right, "k", right_cols=["rid"], tiebreak="rid").collect()[0]
    assert out.asof_rid == 9  # max-tiebreak among simultaneous rows


def test_sessionize_gap_boundaries(spark):
    rows = [
        ("u1", _ts(0), 1), ("u1", _ts(29), 2),   # same session (gap 29 < 30)
        ("u1", _ts(59), 3),                       # still same (29 < 30)
        ("u2", _ts(0), 4),
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, eid long")
    out = {r.eid: r.session_idx for r in sessionize(df, "user", "ts", "30 minutes", "eid").collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}
    rows2 = [("u1", _ts(0), 1), ("u1", dt.datetime(2024, 1, 1, 0, 31, 0), 2)]
    df2 = spark.createDataFrame(rows2, "user string, ts timestamp, eid long")
    out2 = {r.eid: r.session_idx for r in sessionize(df2, "user", "ts", "30 minutes", "eid").collect()}
    assert out2 == {1: 1, 2: 2}  # 31-min gap opens a new session
