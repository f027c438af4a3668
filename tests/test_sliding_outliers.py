"""Unit tests: pane-sliced sliding windows and outlier operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.outliers import (
    winsorize,
    zscore_flags,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.windows import (
    sliding_agg,
)

US = 1_000_000
MIN = 60 * US


def test_sliding_agg_matches_brute_force(spark):
    # width 4 min, slide 1 min; events scattered incl. pane boundaries
    ts = [0, 30 * US, 1 * MIN, 2 * MIN + 1, 3 * MIN, 7 * MIN, 8 * MIN - 1]
    df = spark.createDataFrame([(t, 1) for t in ts], ["t_us", "one"])
    got = {
        r.window_start_us: r.n_events
        for r in sliding_agg(
            df, "t_us", width_us=4 * MIN, slide_us=MIN, sums={"s": F.lit(1)}
        ).collect()
    }
    brute = {}
    for t in ts:
        k_hi = t // MIN
        for k in range(k_hi - 3, k_hi + 1):
            brute[k * MIN] = brute.get(k * MIN, 0) + 1
    assert got == brute


def test_sliding_agg_sums_are_window_totals(spark):
    df = spark.createDataFrame(
        [(0, 10), (MIN, 20), (5 * MIN, 40)], ["t_us", "v"]
    )
    got = {
        r.window_start_us: r.total
        for r in sliding_agg(
            df, "t_us", width_us=2 * MIN, slide_us=MIN, sums={"total": F.col("v")}
        ).collect()
    }
    # window starting at 0 covers [0, 2min) → rows at 0 and 1min
    assert got[0] == 30
    assert got[MIN] == 20  # [1min, 3min)
    assert got[5 * MIN] == 40
    assert got[-MIN] == 10  # [-1min, 1min) partial window


def test_sliding_agg_rejects_nondivisible_slide(spark):
    df = spark.createDataFrame([(0, 1)], ["t_us", "v"])
    try:
        sliding_agg(df, "t_us", width_us=100, slide_us=33, sums={})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_winsorize_clips_to_percentile_band(spark):
    rows = [("a", float(v), v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    out = winsorize(df, ["g"], "v", "id", lo=0.10, hi=0.90)
    clipped = {r.v: (r.v_clipped, r.was_clipped) for r in out.collect()}
    # exact linear-interp percentiles of 1..100: p10=10.9, p90=90.1
    assert clipped[1.0] == (10.9, True)
    assert clipped[100.0] == (90.1, True)
    assert clipped[50.0] == (50.0, False)


def test_zscore_flags_marks_extreme_point(spark):
    rows = [("a", 10.0)] * 30 + [("a", 1000.0)] + [("b", 5.0)] * 5
    df = spark.createDataFrame(rows, ["g", "v"])
    out = zscore_flags(df, ["g"], "v", threshold=3.0)
    flagged = [r for r in out.collect() if r.is_outlier]
    assert len(flagged) == 1 and flagged[0].v == 1000.0 and flagged[0].g == "a"
    # constant group has zero variance → z undefined, never flagged
    assert all(not r.is_outlier for r in out.collect() if r.g == "b")


def test_sliding_agg_matches_builtin_sliding_window(spark):
    # pane-sliced formulation == Spark's built-in F.window(width, slide)
    from pyspark.sql import functions as F2

    ts = [11 * US, 73 * US, 119 * US, 180 * US, 299 * US, 300 * US]
    df = spark.createDataFrame([(t, t // US) for t in ts], ["t_us", "v"])

    ours = {
        (r.window_start_us,): (r.n_events, r.total)
        for r in sliding_agg(
            df, "t_us", width_us=4 * MIN, slide_us=MIN, sums={"total": F2.col("v")}
        ).collect()
    }

    b = (
        df.withColumn("ts", F2.timestamp_micros(F2.col("t_us")))
        .groupBy(F2.window("ts", "4 minutes", "1 minute"))
        .agg(F2.count(F2.lit(1)).alias("n"), F2.sum("v").alias("total"))
        .collect()
    )
    builtin = {
        (int(r["window"]["start"].timestamp() * 1_000_000),): (r["n"], r["total"])
        for r in b
    }
    assert ours == builtin


def test_token_bucket_event_time_replay(spark):
    import datetime as dt

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.ratelimit import (
        token_bucket_flags,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minutes):
        return (1, eid, t0 + dt.timedelta(minutes=minutes))

    # capacity 3, refill 1 token/hour: events at t=0,1,2 drain the
    # bucket; t=3 is throttled; t=63 has refilled exactly 1 token
    # (60 min) → allowed; t=64 throttled again.
    df = spark.createDataFrame(
        [ev(1, 0), ev(2, 1), ev(3, 2), ev(4, 3), ev(5, 63), ev(6, 64)],
        ["user_id", "event_id", "ts"],
    )
    out = {
        r["event_id"]: r["allowed"]
        for r in token_bucket_flags(
            df, capacity_tokens=3, refill_us_per_token=3_600_000_000
        ).collect()
    }
    assert out == {1: True, 2: True, 3: True, 4: False, 5: True, 6: False}


def test_token_bucket_caps_at_capacity(spark):
    import datetime as dt

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.ratelimit import (
        token_bucket_flags,
    )

    t0 = dt.datetime(2024, 1, 1)
    # a week of idle time must NOT bank more than capacity=2 tokens:
    # after the gap only events 3 and 4 are admitted, 5 is throttled
    rows = [
        (7, 1, t0),
        (7, 2, t0 + dt.timedelta(minutes=1)),
        (7, 3, t0 + dt.timedelta(days=7)),
        (7, 4, t0 + dt.timedelta(days=7, minutes=1)),
        (7, 5, t0 + dt.timedelta(days=7, minutes=2)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    out = {
        r["event_id"]: r["allowed"]
        for r in token_bucket_flags(
            df, capacity_tokens=2, refill_us_per_token=3_600_000_000
        ).collect()
    }
    assert out == {1: True, 2: True, 3: True, 4: True, 5: False}
