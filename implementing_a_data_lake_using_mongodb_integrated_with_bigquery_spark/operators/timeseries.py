"""Time-series spine generation and gap-filling (hypertable-style).

The reference's pipeline is an hourly observation feed with missing
polls (its freshness gate simply DROPS stale hours). The analytical
complement is gap-filling: materialize the complete per-key hour spine
and carry the last observation forward, so downstream window math sees
a dense series.

Scale shape: the spine is generated per key from that key's own
[min, max] bounds (``sequence`` + ``explode`` — no cross join against a
global calendar, so a key observed for one day doesn't explode into
the full corpus time range); the fill is one per-key ordered window.
Two shuffles total (bounds agg reused for the spine, the fill window),
both keyed by the series key — co-partitioned end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_gaps(
    series: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    step: int,
) -> DataFrame:
    """Dense spine + forward fill over an integer time axis (epoch
    micros by convention): one row per ``step`` between each key's
    first and last observation. Emits ``(key, time, <value> filled,
    was_gap)``; leading values are never null by construction (every
    spine starts at an observed point).
    """
    bounds = series.groupBy(key_col).agg(
        F.min(time_col).alias("_lo"), F.max(time_col).alias("_hi")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step).cast("long"))
        ).alias(time_col),
    )
    joined = spine.join(series, [key_col, time_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        time_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNull().alias("was_gap"),
    )
