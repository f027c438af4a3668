"""Exact-sum proportional allocation (largest-remainder proration).

The finance/billing primitive SQL keeps getting wrong: split an
integer total T across a group's rows proportionally to weights so
that (a) every share is an integer, (b) the shares SUM EXACTLY to T,
and (c) rounding error lands on the rows that deserve it. Naive
``round(T * w / W)`` violates (b) — the cents drift — and iterative
"adjust the last row" fixups violate (c) and are order-dependent.

Largest-remainder (Hamilton) method, all in BIGINT:

  base_i = (T * w_i) div W          (floor shares)
  R      = T - sum(base_i)          (0 <= R < n leftover units)
  give +1 to the R rows with the largest remainder (T * w_i) mod W,
  total-order tiebreak on the id column.

Every quantity is exact integer arithmetic — (T * w) fits BIGINT for
cents-scaled money at any realistic magnitude — so the result is
engine-reproducible bit-for-bit.

Scale shape: three window passes over the SAME group partitioning
(weight sum, floor-share sum, remainder rank) — one key shuffle
total, no joins, no driver work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prorate_largest_remainder(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    total_col: str,
    id_col: str,
) -> DataFrame:
    """Add an exact integer ``alloc`` column distributing each group's
    ``total_col`` (constant within the group, BIGINT) across its rows
    proportionally to ``weight_col`` (non-negative BIGINT, group sum
    must be positive). Guarantees ``sum(alloc) == total`` per group.
    """
    g = Window.partitionBy(group_col)
    order = Window.partitionBy(group_col).orderBy(
        F.expr(f"({total_col} * {weight_col}) % __wsum").desc(),
        F.col(id_col).asc(),
    )
    with_sum = df.withColumn("__wsum", F.sum(weight_col).over(g))
    base = F.expr(f"({total_col} * {weight_col}) div __wsum")
    with_base = with_sum.withColumn("__base", base).withColumn(
        "__rn", F.row_number().over(order)
    )
    leftover = F.col(total_col) - F.sum("__base").over(g)
    return (
        with_base.withColumn(
            "alloc",
            (
                F.col("__base")
                + F.when(F.col("__rn") <= leftover, F.lit(1)).otherwise(F.lit(0))
            ).cast("long"),
        )
        .drop("__wsum", "__base", "__rn")
    )
