"""Cohort retention and ordered-funnel analytics over event streams.

Generalizes the reference's reporting aggregates (SURVEY.md §2.5 A4 —
count-per-bucket summaries in ``src/monitor.sh`` / ingestion logs) to
the two standard product-analytics shapes a warehouse team asks of the
same event data: "of the users first seen in period P, how many were
active k periods later?" (retention triangle) and "how many users
completed stage 1 → 2 → 3 in order?" (conversion funnel).

Scale notes:

- ``cohort_retention`` never joins: activity is reduced to distinct
  (user, period) pairs (one shuffle, map-side combined), the user's
  cohort is a MIN window over the already-reduced pairs (second
  shuffle on user), and the triangle is a final small aggregate. All
  shuffle inputs shrink monotonically — at 100 TB the first aggregate
  does the heavy lifting and everything after it is per-user-sized.
- ``funnel`` is one conditional aggregation per user (single shuffle,
  map-side combined) followed by a scalar reduce to one row and a
  constant-width unpivot; stage timestamps use strict ``>`` ordering
  (a click at the exact view instant does not convert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.functions.cleaning import (
    epoch_us,
)

_PERIOD_DAYS = {"day": 1, "week": 7}


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Retention triangle: rows (cohort_us, period_offset, n_users)
    where ``cohort_us`` is the epoch-micros start of the user's first
    active period and ``period_offset`` counts periods since it."""
    if period not in _PERIOD_DAYS:
        raise ValueError(f"period must be one of {sorted(_PERIOD_DAYS)}")
    days = _PERIOD_DAYS[period]
    p = F.date_trunc(period, F.col(ts_col))
    active = (
        events.select(F.col(user_col).alias("u"), p.alias("p"))
        .groupBy("u", "p")
        .agg(F.count(F.lit(1)).alias("_n"))
        .drop("_n")
    )
    cohort = F.min("p").over(Window.partitionBy("u"))
    offset = (F.datediff(F.col("p"), cohort) / days).cast("long")
    return (
        active.select(
            epoch_us(cohort).alias("cohort_us"), offset.alias("period_offset"), "u"
        )
        .groupBy("cohort_us", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: one row per stage with the number of
    users whose first occurrence of each stage strictly follows the
    previous stage's first occurrence."""
    if len(stages) < 2:
        raise ValueError("funnel needs at least two stages")
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"t{i}")
            for i, s in enumerate(stages)
        ]
    )
    reached = F.col("t0").isNotNull()
    flags = [reached]
    for i in range(1, len(stages)):
        reached = reached & (F.col(f"t{i}") > F.col(f"t{i - 1}"))
        flags.append(reached)
    counts = per_user.agg(
        *[F.sum(fl.cast("long")).alias(f"n{i}") for i, fl in enumerate(flags)]
    )
    stack_args = ", ".join(
        f"{i}L, '{s}', n{i}" for i, s in enumerate(stages)
    )
    return counts.selectExpr(
        f"stack({len(stages)}, {stack_args}) as (stage_idx, stage, n_users)"
    )
