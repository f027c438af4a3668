"""Unit tests: binned interval-containment join vs the naive predicate
join it lowers (operators/rangejoin.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.rangejoin import (
    bin_range_join,
)


@pytest.fixture()
def points(spark):
    vals = [0.0, 9.99, 10.0, 25.0, 49.5, 50.0, 120.0, 499.9, 777.7]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["pid", "value"]
    )


@pytest.fixture()
def intervals(spark):
    rows = [
        (1, 0.0, 10.0),     # half-open: 10.0 excluded
        (2, 10.0, 50.0),    # 10.0 included here
        (3, 25.0, 120.0),   # overlaps band 2
        (4, 0.0, 500.0),    # spans many bins
        (5, 600.0, 601.0),  # sub-bin-width interval
    ]
    return spark.createDataFrame(rows, ["band_id", "lo", "hi"])


def _naive(points, intervals, how="inner"):
    cond = (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    return points.join(intervals, on=cond, how=how)


def _pairs(df):
    return sorted((r.pid, r.band_id) for r in df.select("pid", "band_id").collect())


@pytest.mark.parametrize("bin_width", [1.0, 7.0, 50.0, 1000.0])
def test_matches_naive_join_at_any_bin_width(spark, points, intervals, bin_width):
    got = bin_range_join(points, intervals, "value", bin_width=bin_width)
    assert _pairs(got) == _pairs(_naive(points, intervals))


def test_boundary_semantics(spark, points, intervals):
    pairs = _pairs(bin_range_join(points, intervals, "value", bin_width=10.0))
    assert (2, 1) not in pairs  # value 10.0 excluded from [0, 10)
    assert (2, 2) in pairs      # ... and included in [10, 50)
    assert (8, 5) not in pairs and all(b != 5 for _, b in pairs)  # empty band


def test_no_duplicate_pairs_on_overlap(spark, points, intervals):
    got = bin_range_join(points, intervals, "value", bin_width=10.0)
    pairs = _pairs(got)
    assert len(pairs) == len(set(pairs))
    # value 25.0 sits in bands 2, 3 and 4 simultaneously
    assert [b for p, b in pairs if p == 3] == [2, 3, 4]


def test_left_join_keeps_unmatched_points(spark, points, intervals):
    got = bin_range_join(points, intervals, "value", bin_width=10.0, how="left")
    naive = _naive(points, intervals, how="left")
    def k(df):
        rows = [(r.pid, r.band_id) for r in df.select("pid", "band_id").collect()]
        return sorted(rows, key=lambda x: (x[0], x[1] if x[1] is not None else -1))
    assert k(got) == k(naive)
    assert (8, None) in k(got)  # 777.7 matches nothing


def test_rejects_bad_args(spark, points, intervals):
    with pytest.raises(ValueError):
        bin_range_join(points, intervals, "value", bin_width=0.0)
    with pytest.raises(ValueError):
        bin_range_join(points, intervals, "value", how="outer")
