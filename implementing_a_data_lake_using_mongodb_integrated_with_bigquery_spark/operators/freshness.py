"""Freshness / time-bucket operators.

Reference semantics: the hourly ingester computes the expected
observation hour as GMT+7 wall-clock truncated to the hour
(``src/ingest_weather_data.py:142``) and keeps an API response only if
``current.last_updated`` equals it exactly
(``src/ingest_weather_data.py:64-71``) — i.e. a watermark of "current
hour only", with stale data rejected.

Here the bucket is derived *from the data* (max event time) rather than
the wall clock, so results are deterministic and testable; production
callers can pass an explicit ``as_of``.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hour_bucket(col, tz: str | None = None):
    """date_trunc('hour', ts), optionally shifted into a timezone first
    (the reference's GMT+7 convention → tz='Asia/Ho_Chi_Minh')."""
    c = F.col(col) if isinstance(col, str) else col
    if tz:
        c = F.from_utc_timestamp(c, tz)
    return F.date_trunc("hour", c)


def freshness_filter(
    df: DataFrame,
    ts_col: str,
    as_of: dt.datetime | None = None,
    tz: str | None = None,
) -> DataFrame:
    """Keep only rows whose hour bucket equals the expected hour.

    ``as_of=None`` derives the expected hour from ``max(ts_col)`` via a
    scalar subquery (one tiny agg, no driver round-trip in the plan).
    """
    bucket = hour_bucket(ts_col, tz)
    if as_of is not None:
        expected = F.date_trunc("hour", F.lit(as_of))
    else:
        agg = df.agg(F.date_trunc("hour", F.max(ts_col)).alias("h"))
        expected = F.lit(agg.first()["h"])
    return df.filter(bucket == expected)
