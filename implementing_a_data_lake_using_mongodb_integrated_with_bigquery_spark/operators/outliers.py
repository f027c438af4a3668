"""Per-group outlier handling: winsorization and z-score flagging.

Training-data curation clips or drops extreme values before they
skew mixture weights and loss statistics; warehouse pipelines do the
same before reporting. Both operators here follow the same two-phase
shape: a tiny per-group statistics aggregate (|groups| rows), then a
broadcast join back onto the fact stream and a map-only row
transform. The corpus is scanned twice but never shuffled — at 100 TB
the second scan is the cheap part and the stats table is bytes.

Determinism: winsor bounds use exact order-statistics percentiles
(:func:`..windows.grouped_percentile_exact` — bit-equal to both
``F.percentile`` and DuckDB ``quantile_cont``, proven by
``test_grouped_percentile_exact_bit_parity``); z-scores derive from
exact scaled-integer power sums (the ``value_moments`` convention),
never the order-sensitive streaming ``stddev``.

Scale note (r10): the bounds table is NOT computed with the
``percentile()`` aggregate — its buffer holds EVERY value of a group,
so a ~5-value group key over a fact table is five fact-sized
aggregation buffers at 100 TB (the r9 audit's unbounded-buffer
class). ``grouped_percentile_exact`` range-sorts on the composite
(group, value) key instead, so every task handles ~|data|/|tasks|
rows regardless of group cardinality; the resulting |groups|-row
bounds table is then genuinely tiny and broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import grouped_percentile_exact


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lo, hi] exact percentile
    band: adds ``<value>_clipped`` (6dp) and ``was_clipped``.
    ``tiebreak_col`` must make (value, tiebreak) a per-group total
    order (any unique id column)."""
    bounds = grouped_percentile_exact(
        df.select(*group_cols, value_col, tiebreak_col),
        group_cols,
        value_col,
        tiebreak_col,
        {"_lo": lo, "_hi": hi},
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
    integer power sums so the flag set is partition-order-independent;
    the sums accumulate in DECIMAL(38,0) (r11 int64-overflow sweep: a
    LONG Σvi² overflows past ~9.2e18/vi²_max rows per group — ~293k
    rows at the events value span; an ANSI ArithmeticException at
    scale, a silent wrap with ANSI off) and cast to DOUBLE before the
    division tree, which keeps the float values bit-identical to the
    BIGINT-summing oracles."""
    vi = F.round(F.col(value_col) * scale).cast("long")
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(vi.cast("decimal(38,0)")).alias("_s1d"),
        F.sum((vi * vi).cast("decimal(38,0)")).alias("_s2d"),
    )
    _s1 = F.col("_s1d").cast("double")
    _s2 = F.col("_s2d").cast("double")
    mean = _s1 / F.col("_n") / float(scale)
    var = (
        _s2 / F.col("_n")
        - (_s1 / F.col("_n")) * (_s1 / F.col("_n"))
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
