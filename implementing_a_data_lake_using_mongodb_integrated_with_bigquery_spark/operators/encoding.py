"""Categorical feature encoding for ML training tables.

``target_encode`` is the m-estimate (Bayesian-smoothed) target mean —
the standard leakage-resistant categorical encoder: a category's code
is its target mean shrunk toward the global prior, with shrinkage
weight ``m`` acting as a pseudo-count (categories with few rows stay
near the prior; popular ones converge to their own mean).

Scale shape: one hash aggregate down to |categories| (map-side
combined), one 1-row global total cross-joined back — the fact table
is scanned once and nothing bigger than the category table shuffles.

Determinism: per-category sums are scaled-integer (cents) BIGINTs, so
both the numerator and the prior are exact; the only float ops are
the final fixed-shape expression over exact integers — identical on
any engine/partitioning (the registry's scaled-integer convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: Column | str,
    m: int = 10,
    scale: int = 100,
) -> DataFrame:
    """(category, n, encoded) — smoothed target mean per category:
    ``(sum + m·prior) / (n + m)`` with ``prior`` the global mean."""
    t = F.col(target_col) if isinstance(target_col, str) else target_col
    g = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(t * scale).cast("long")).cast("long").alias("_s"),
    )
    # distinct names, not just distinct case: Spark resolution is
    # case-insensitive, so "_S" would collide with "_s"
    tot = g.agg(
        F.sum("n").cast("long").alias("_tot_n"),
        F.sum("_s").cast("long").alias("_tot_s"),
    )
    enc = F.round(
        (F.col("_s") + float(m) * F.col("_tot_s") / F.col("_tot_n"))
        / (F.col("n") + F.lit(m))
        / float(scale),
        6,
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(cat_col, "n", enc.alias("encoded"))
    )
