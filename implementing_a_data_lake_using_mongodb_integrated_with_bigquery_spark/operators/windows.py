"""Time-window aggregation and top-k-per-group operators.

The reference's ingest cadence is a 1-hour tumbling window
(EventBridge ``cron(10 * * * ? *)``, ``README.md:76-78``) with the
current-hour freshness predicate acting as the window assignment
(``src/ingest_weather_data.py:142``). Batch form here; the streaming
form (with watermarks) lives in ``streaming/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Tumbling-window aggregation: window(ts, duration) × group_cols.
    Emits window_start/window_end timestamp columns."""
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """row_number over (group, order) ≤ k — the set-oriented form of the
    reference's early-exit best-candidate scan
    (``src/ingest_places_data.py:60-62``, limit-1 semantics).
    Pass fully deterministic ``order_by`` (include a unique tiebreak)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
