"""Grid-bucketed bounded-radius nearest-neighbor join.

The spatial-join primitive lowered the same way as
``operators.rangejoin``: a naive nearest-neighbor join is a cartesian
argmin (|left| × |right| — fatal at scale); the standard lowering
snaps both sides to a fixed grid and probes only the 3×3 cell
neighborhood around each left point, turning the search into a hash
EQUI-join on the cell id. Semantics are explicitly BOUNDED-RADIUS:
the result is the nearest right-side point *within the 3×3
neighborhood* (left rows with no candidate there are dropped), which
is the contract production geo joins ship ("nearest within r").
When the returned distance is <= cell_size the answer is also the
GLOBAL nearest (any point outside the neighborhood is > cell_size
away) — callers needing the unconditional nearest re-probe the rare
far rows with a wider grid.

Determinism: coordinates and distances are integers (squared
euclidean — monotone in true distance, so the argmin is identical and
no sqrt/trig enters the plan); the argmin tiebreak is the right-side
id, total order.

Scale shape: the left side explodes ×9 (its neighborhood), the right
side keeps one row per cell; the join is a plain equi-join on cell
AQE can shuffle/broadcast/skew-split, followed by one per-left-row
min-struct aggregate. Cost knob ``cell_size`` ~ the expected
nearest-neighbor distance: too small finds nothing, too large
degrades toward per-cell cartesian checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_nearest_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    x_col: str = "x",
    y_col: str = "y",
    cell_size: int = 100,
) -> DataFrame:
    """For each left row, the nearest right row (squared integer
    euclidean, right-id tiebreak) among the 3×3 grid cells around the
    left point. Emits ``(left_id, right_id, dist_sq)``.

    Both inputs need integer ``x_col``/``y_col`` columns.
    """
    if cell_size <= 0:
        raise ValueError("cell_size must be positive")
    cx = F.floor(F.col(x_col) / cell_size).cast("long")
    cy = F.floor(F.col(y_col) / cell_size).cast("long")
    offs = F.expr("sequence(-1, 1)")
    l = (
        left.select(
            F.col(left_id).alias("_lid"),
            F.col(x_col).alias("_lx"),
            F.col(y_col).alias("_ly"),
            cx.alias("_cx"),
            cy.alias("_cy"),
            F.explode(offs).alias("_dx"),
        )
        .select("_lid", "_lx", "_ly", "_cx", "_cy", "_dx", F.explode(offs).alias("_dy"))
        .select(
            "_lid",
            "_lx",
            "_ly",
            F.concat_ws(
                ":", F.col("_cx") + F.col("_dx"), F.col("_cy") + F.col("_dy")
            ).alias("_cell"),
        )
    )
    r = right.select(
        F.col(right_id).alias("_rid"),
        F.col(x_col).alias("_rx"),
        F.col(y_col).alias("_ry"),
        F.concat_ws(":", cx, cy).alias("_cell"),
    )
    d2 = (F.col("_lx") - F.col("_rx")) * (F.col("_lx") - F.col("_rx")) + (
        F.col("_ly") - F.col("_ry")
    ) * (F.col("_ly") - F.col("_ry"))
    return (
        l.join(r, "_cell")
        .groupBy(F.col("_lid").alias(left_id))
        .agg(
            F.min(
                F.struct(
                    d2.cast("long").alias("dist_sq"),
                    F.col("_rid").alias(right_id),
                )
            ).alias("_best")
        )
        .select(left_id, f"_best.{right_id}", "_best.dist_sq")
    )
