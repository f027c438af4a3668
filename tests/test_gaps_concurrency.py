"""Unit tests: gaps-and-islands and interval-concurrency sweep
(operators/windows.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.windows import (
    inactivity_gaps,
    max_concurrency,
)

US = 1_000_000
HOUR = 3600 * US


def test_inactivity_gaps_detects_only_long_gaps(spark):
    t = lambda h, m=0: datetime(2024, 1, 1, h, m)
    rows = [
        (1, 1, t(0)), (2, 1, t(0, 30)),   # 30 min gap: below threshold
        (3, 1, t(8)),                     # 7.5h gap: reported
        (4, 2, t(0)), (5, 2, t(1)),       # different user, 1h: below
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    got = inactivity_gaps(df, "user_id", "ts", "event_id", min_gap_seconds=6 * 3600).collect()
    assert len(got) == 1
    g = got[0]
    assert g.user_id == 1 and g.gap_us == int(7.5 * HOUR)
    assert g.gap_end_us - g.gap_start_us == g.gap_us


def test_inactivity_gaps_tie_ordering_is_deterministic(spark):
    t0 = datetime(2024, 1, 1)
    rows = [(2, 1, t0), (1, 1, t0), (3, 1, datetime(2024, 1, 2))]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    got = inactivity_gaps(df, "user_id", "ts", "event_id", min_gap_seconds=3600)
    assert got.count() == 1  # the two t0 rows are a zero gap, not two rows


def _brute_peaks(intervals, bucket_us=HOUR):
    """Peak at change instants per bucket, ends before starts on ties."""
    changes = [(s, 1) for s, e in intervals] + [(e, -1) for s, e in intervals]
    changes.sort()
    peaks, running = {}, 0
    i = 0
    while i < len(changes):
        j = i
        while j < len(changes) and changes[j][:2] == changes[i][:2]:
            running += changes[j][1]
            j += 1
        b = changes[i][0] // bucket_us * bucket_us
        peaks[b] = max(peaks.get(b, -10**18), running)
        i = j
    return peaks


def test_max_concurrency_matches_brute_force(spark):
    # overlapping, nested, cross-bucket-spanning, zero-length, and
    # boundary-touching intervals
    iv = [
        (0, 10 * US),
        (5 * US, 20 * US),
        (10 * US, 30 * US),          # starts exactly when #1 ends
        (0, 3 * HOUR),               # spans buckets
        (HOUR + US, HOUR + US),      # zero-length
        (2 * HOUR - US, 2 * HOUR + US),
        (2 * HOUR + US, 2 * HOUR + 2 * US),
    ]
    df = spark.createDataFrame(iv, ["s", "en"])
    got = {r.bucket_us: r.peak for r in max_concurrency(df, "s", "en").collect()}
    assert got == _brute_peaks(iv)


def test_max_concurrency_half_open_no_overlap_at_touch(spark):
    # back-to-back [0,1h) and [1h,2h): concurrency never exceeds 1
    iv = [(0, HOUR), (HOUR, 2 * HOUR)]
    df = spark.createDataFrame(iv, ["s", "en"])
    got = {r.bucket_us: r.peak for r in max_concurrency(df, "s", "en").collect()}
    assert max(got.values()) == 1
