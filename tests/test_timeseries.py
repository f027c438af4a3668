"""Unit tests for spine generation + forward gap-filling."""

from __future__ import annotations

from pyspark.sql import Row

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.timeseries import (
    fill_gaps,
)


def test_fill_gaps_densifies_and_carries_forward(spark):
    series = spark.createDataFrame(
        [
            Row(k="a", t=0, v=1.0),
            Row(k="a", t=30, v=4.0),   # gap at 10, 20
            Row(k="b", t=10, v=9.0),   # single point -> no gaps
        ]
    )
    out = {
        (r["k"], r["t"]): (r["v"], r["was_gap"])
        for r in fill_gaps(series, "k", "t", "v", step=10).collect()
    }
    assert out == {
        ("a", 0): (1.0, False),
        ("a", 10): (1.0, True),
        ("a", 20): (1.0, True),
        ("a", 30): (4.0, False),
        ("b", 10): (9.0, False),
    }


def test_fill_gaps_no_leading_nulls_and_bounds_respected(spark):
    series = spark.createDataFrame(
        [Row(k=1, t=100, v=5.0), Row(k=1, t=140, v=6.0)]
    )
    rows = fill_gaps(series, "k", "t", "v", step=20).collect()
    assert [r["t"] for r in sorted(rows, key=lambda r: r["t"])] == [100, 120, 140]
    assert all(r["v"] is not None for r in rows)
