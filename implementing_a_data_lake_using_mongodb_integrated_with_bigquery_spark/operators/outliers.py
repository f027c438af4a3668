"""Per-group outlier handling: winsorization and z-score flagging.

Training-data curation clips or drops extreme values before they
skew mixture weights and loss statistics; warehouse pipelines do the
same before reporting. Both operators here follow the same two-phase
shape: a tiny per-group statistics aggregate (|groups| rows), then a
broadcast join back onto the fact stream and a map-only row
transform. The corpus is scanned twice but never shuffled — at 100 TB
the second scan is the cheap part and the stats table is bytes.

Determinism: winsor bounds use exact sort-based percentiles
(``F.percentile`` ↔ DuckDB ``quantile_cont`` — the established
``value_percentiles`` parity); z-scores derive from exact
scaled-integer power sums (the ``value_moments`` convention), never
the order-sensitive streaming ``stddev``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lo, hi] exact percentile
    band: adds ``<value>_clipped`` (6dp) and ``was_clipped``."""
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(value_col, F.lit(lo)).alias("_lo"),
        F.percentile(value_col, F.lit(hi)).alias("_hi"),
    )
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return (
        df.join(F.broadcast(bounds), group_cols)
        .select(
            *df.columns,
            F.round(clipped, 6).alias(f"{value_col}_clipped"),
            ((v < F.col("_lo")) | (v > F.col("_hi"))).alias("was_clipped"),
        )
    )


def zscore_flags(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    threshold: float = 3.0,
    scale: int = 10000,
) -> DataFrame:
    """Per-row z-score against the row's group mean/stddev, plus an
    ``is_outlier`` flag at |z| > threshold. Moments come from exact
    integer power sums so the flag set is partition-order-independent."""
    vi = F.round(F.col(value_col) * scale).cast("long")
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(vi).alias("_s1"),
        F.sum(vi * vi).alias("_s2"),
    )
    mean = F.col("_s1") / F.col("_n") / float(scale)
    var = (
        F.col("_s2") / F.col("_n")
        - (F.col("_s1") / F.col("_n")) * (F.col("_s1") / F.col("_n"))
    ) / float(scale * scale)
    # zero-variance groups have no defined z — NULL score, never
    # flagged (a plain divide is an ANSI-mode runtime error)
    z = F.when(var > 0, (F.col(value_col) - mean) / F.sqrt(var))
    return (
        df.join(F.broadcast(stats), group_cols)
        .select(
            *df.columns,
            F.round(z, 6).alias("zscore"),
            F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_outlier"),
        )
    )
