"""Group-wise ordinary-least-squares regression from exact power sums.

Extends the reporting-aggregate family (SURVEY.md §2.5 A4) with the
classic analytics primitive Spark exposes only as order-sensitive
streaming aggregates (``regr_slope``'s low bits depend on partition
visit order, like ``stddev`` — see ``value_moments``). Here every
moment is an exact scaled-integer sum, so slope/intercept/R² are pure
functions of the data under ANY partitioning — reproducible across
engines, which is what makes them oracle-checkable.

Scale shape: one map-side-combined hash aggregate (the five power
sums), then constant per-group float math. No window, no second pass;
shuffle volume is |groups| rows.

Overflow discipline: with y scaled by ``y_scale`` (default 100,
integer cents) and |x| ≤ 2^20, the Σx²·y² terms stay within int64 for
~10⁹ rows per group; beyond that, pass pre-scaled columns and sum in
decimal(38,0) — the formula below only ever sees doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_linreg(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
    y_scale: int = 100,
) -> DataFrame:
    """Per-group OLS of y on x: (groups, n, slope, intercept, r2),
    rounded to 6dp. ``x`` must already be integral (epoch bucket,
    hour index...); ``y`` is scaled+rounded to integers internally."""
    xi = x.cast("long")
    yi = F.round(y * y_scale).cast("long")
    # per-term products stay long (bounded by the scaled value span);
    # the SUMS accumulate in DECIMAL(38,0) — a LONG Σy² overflows past
    # ~9.2e18/y²_max rows per group (r11 int64-overflow sweep; ANSI
    # raises at scale) while the oracle's HUGEINT stays exact
    _d38 = "decimal(38,0)"
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast(_d38)).alias("sx"),
        F.sum(yi.cast(_d38)).alias("sy"),
        F.sum((xi * xi).cast(_d38)).alias("sxx"),
        F.sum((xi * yi).cast(_d38)).alias("sxy"),
        F.sum((yi * yi).cast(_d38)).alias("syy"),
    )
    # identical double-arithmetic shape as the SQL oracle: every sum is
    # cast to double BEFORE any product, so no float-path overflow and
    # no engine-specific widening (DuckDB sums land in int128)
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope_i = num / den
    intercept_i = (sy - slope_i * sx) / n
    r2 = (num * num) / (den * (n * syy - sy * sy))
    return agg.select(
        *group_cols,
        "n",
        F.round(slope_i / y_scale, 6).alias("slope"),
        F.round(intercept_i / y_scale, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )
