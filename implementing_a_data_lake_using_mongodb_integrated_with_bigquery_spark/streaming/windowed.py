"""Streaming windowed aggregation with watermarks (SURVEY §2.7 T4/T5).

The reference's hourly cadence + freshness rejection is, in Spark
terms, a 1-hour tumbling window with a short allowed lateness
(reference: Lambda deadline ≈ 5 min, ``README.md:13,74``): rows older
than the watermark are dropped, exactly like the reference's
``last_updated == expected`` predicate discarding stale observations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    duration: str = "1 hour",
    lateness: str = "5 minutes",
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an unbounded
    stream. State is bounded: windows older than the watermark are
    finalized and evicted."""
    group_cols = group_cols or []
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    return (
        stream.withWatermark(ts_col, lateness)
        .groupBy(F.window(ts_col, duration).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )
