"""Distribution drift detection — exact two-sample KS statistic.

A pipeline ingesting continuously (the reference polls hourly forever,
``src/main.py``) needs to notice when the DATA changes, not just when
the code breaks: upstream schema abuse, sensor recalibration, a
quality regression in a crawl. The standard nonparametric alarm is the
two-sample Kolmogorov–Smirnov statistic — the max gap between the two
empirical CDFs.

Scale shape: the corpus reduces FIRST to per-(group, quantized value)
conditional counts — one combiner-reduced shuffle whose output is
bounded by |groups| × |value support|, not row count. CDFs are then
running integer sums over that small support table (window per group),
and the KS max is a final aggregate. Exact, no sampling, no Python —
and deterministic, because every CDF step is a ratio of exact integer
counts (evaluated at support points, so quantization only coarsens
resolution, never correctness of the quantized statistic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ks_drift(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sample_a: Column,
    scale: int = 100,
) -> DataFrame:
    """Per-group KS statistic between rows where ``sample_a`` holds
    (sample A) and the rest (sample B): (groups, n_a, n_b, ks), ks
    rounded 6dp, NULL when either sample is empty."""
    v = F.round(F.col(value_col) * scale).cast("long")
    per_v = df.groupBy(*group_cols, v.alias("_v")).agg(
        F.sum(F.when(sample_a, 1).otherwise(0)).cast("long").alias("_a"),
        F.sum(F.when(sample_a, 0).otherwise(1)).cast("long").alias("_b"),
    )
    w_tot = Window.partitionBy(*group_cols)
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_a, cum_b = F.sum("_a").over(w_cum), F.sum("_b").over(w_cum)
    tot_a, tot_b = F.sum("_a").over(w_tot), F.sum("_b").over(w_tot)
    gap = F.when(
        (tot_a > 0) & (tot_b > 0),
        F.abs(
            cum_a.cast("double") / tot_a - cum_b.cast("double") / tot_b
        ),
    )
    stepped = per_v.select(
        *group_cols,
        tot_a.alias("_ta"),
        tot_b.alias("_tb"),
        gap.alias("_gap"),
    )
    return stepped.groupBy(*group_cols).agg(
        F.first("_ta").alias("n_a"),
        F.first("_tb").alias("n_b"),
        F.round(F.max("_gap"), 6).alias("ks"),
    )


def psi_drift(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sample_a: Column,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1000.0,
) -> DataFrame:
    """Population Stability Index per group over fixed equal-width
    bins: ``Σ (p_a - p_b) · ln(p_a / p_b)`` — the industry-standard
    scorecard drift metric (PSI > 0.2 ≈ significant shift).

    Bins with zero mass on either side are SKIPPED (their PSI term is
    undefined); fixed bin edges rather than per-run quantile edges
    keep the metric comparable across runs and engines. Same scale
    shape as :func:`ks_drift`: one combiner-reduced count shuffle
    bounded by |groups| × n_bins, then constant per-group math.
    """
    width = (hi - lo) / n_bins
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - lo) / width).cast("long")),
    )
    per_bin = df.groupBy(*group_cols, bin_.alias("_bin")).agg(
        F.sum(F.when(sample_a, 1).otherwise(0)).cast("long").alias("_a"),
        F.sum(F.when(sample_a, 0).otherwise(1)).cast("long").alias("_b"),
    )
    w_tot = Window.partitionBy(*group_cols)
    pa = F.col("_a").cast("double") / F.sum("_a").over(w_tot)
    pb = F.col("_b").cast("double") / F.sum("_b").over(w_tot)
    term = F.when(
        (F.col("_a") > 0) & (F.col("_b") > 0), (pa - pb) * F.log(pa / pb)
    )
    stepped = per_bin.select(
        *group_cols,
        F.sum("_a").over(w_tot).alias("_ta"),
        F.sum("_b").over(w_tot).alias("_tb"),
        term.alias("_term"),
    )
    # per-term scale-to-integer before the sum: even a 10-element
    # double sum is partition-order-dependent in its low bits, and the
    # oracle hash would flake (registry determinism convention)
    term_i = F.round(F.col("_term") * 1e9).cast("long")
    return stepped.groupBy(*group_cols).agg(
        F.first("_ta").alias("n_a"),
        F.first("_tb").alias("n_b"),
        F.round(F.sum(term_i) / 1e9, 6).alias("psi"),
    )
