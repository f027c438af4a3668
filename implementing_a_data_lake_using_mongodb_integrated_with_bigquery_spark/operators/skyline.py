"""2-D skyline (Pareto-front / dominance) filter.

The multi-objective complement of top-k: keep every row no other row
dominates, where row A dominates row B iff A is <= B in both
dimensions and strictly < in at least one. Classic warehouse ask
("cheapest-for-its-size parts", "fastest-for-its-cost suppliers")
that plain ORDER BY ... LIMIT cannot express; the reference's query
surface has only single-objective ranking (SURVEY.md §2.6).

Scale shape: the textbook skyline needs an all-pairs dominance check
(quadratic, a NOT EXISTS self-join). This lowering is linear: first
aggregate to DISTINCT (x, y) points with multiplicities — one hash
aggregate, bounded by the value domain, not the row count — keep only
the min-y point per x (anything else in the x-group is dominated
within the group), then a strict-prefix running min over x ascending:
a point is on the front iff its y is strictly below the running min
of every strictly-smaller x. Equal points (ties in BOTH dims)
dominate nothing and survive together, carried by the multiplicity
count.

The prefix min is DISTRIBUTED (the global_rank two-phase shape: range
sort pinned by an eager localCheckpoint, per-partition prefix min
inside a partitioned window, the |partitions|-row cross-partition
carry broadcast back) — the x domain is a value domain (prices,
sizes), which at 100 TB can be millions of distinct values, too big
to justify the single-task unpartitioned window the naive form uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """Pareto front minimizing ``(x_col, y_col)`` jointly.

    Emits one row per surviving distinct point:
    ``(x, y, n_rows, min_id)`` — ``n_rows`` counts the identical rows
    collapsed into the point, ``min_id`` is a stable exemplar. Integer
    x/y keep every comparison exact.
    """
    pts = df.groupBy(F.col(x_col).alias("x"), F.col(y_col).alias("y")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(id_col).alias("min_id"),
    )
    # within an x-group only the min-y point can be non-dominated
    per_x = Window.partitionBy("x").orderBy(F.col("y").asc())
    best = pts.withColumn("_r", F.row_number().over(per_x)).where(
        F.col("_r") == 1
    )
    # strict-prefix running min over x ascending, DISTRIBUTED: range
    # sort on x (one row per distinct x, so x alone is a total order),
    # pinned so the carry branch and the main branch read one
    # materialization; within-partition prefix min via a PARTITIONED
    # window; the cross-partition carry is a |partitions|-row exclusive
    # running min broadcast back.
    spark = best.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    sorted_best = (
        best.repartitionByRange(n_part, F.col("x"))
        .sortWithinPartitions(F.col("x"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    carry = (
        sorted_best.groupBy("_pid")
        .agg(F.min("y").alias("_py"))
        .withColumn(
            "_carry",
            F.min("_py").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("_pid", "_carry")
    )
    local_run = Window.partitionBy("_pid").orderBy(F.col("x").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        sorted_best.join(F.broadcast(carry), "_pid")
        .withColumn("_pm", F.least(F.min("y").over(local_run), F.col("_carry")))
        .where(F.col("_pm").isNull() | (F.col("y") < F.col("_pm")))
        .select("x", "y", "n_rows", "min_id")
    )
