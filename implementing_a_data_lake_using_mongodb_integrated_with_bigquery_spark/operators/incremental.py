"""Incremental aggregate maintenance: mergeable partial-agg states.

The 100 TB answer to "recompute the hourly rollup": DON'T. Keep the
rollup as a state table of decomposable aggregate pieces (count,
scaled-integer sum, min, max) and fold each new ingest batch into it —
only the delta is ever aggregated, the merge touches state rows for
keys present in the delta. Count/sum/min/max are commutative monoids,
so state ⊕ delta == full recompute, for ANY batching of the input —
that algebraic identity is exactly what the registry query's DuckDB
oracle pins (it computes the full aggregation; the engine computes
split-and-merge).

Scaled-integer sums (the registry determinism convention) are what
make this sound for floats: integer addition is associative, so the
merged result is bit-identical to the direct aggregation under any
partitioning or batch order. avg derives as sum/count at READ time —
never store it, it does not merge.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def agg_state(
    df: DataFrame,
    keys: list[str],
    value: Column | str,
    scale: int = 10000,
) -> DataFrame:
    """Partial-agg state for one batch: (keys, n, sum_scaled, vmin,
    vmax). ``sum_scaled`` is a bigint of round(value*scale) — exact
    and mergeable."""
    v = F.col(value) if isinstance(value, str) else value
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(v * scale).cast("long")).alias("sum_scaled"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold any number of state tables into one — the incremental
    maintenance step (stored state ⊕ new batch's state)."""
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    return unioned.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_scaled").alias("sum_scaled"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def finalize(state: DataFrame, scale: int = 10000) -> DataFrame:
    """Read-time derivation of the presentation columns (sum, avg)
    from the mergeable pieces."""
    return state.select(
        *[c for c in state.columns if c not in ("sum_scaled",)],
        (F.col("sum_scaled") / float(scale)).alias("vsum"),
        F.round(F.col("sum_scaled") / F.col("n") / float(scale), 6).alias("vavg"),
    )


def delta_state(
    df: DataFrame,
    keys: list[str],
    value: Column | str,
    scale: int = 10000,
    sign: int = 1,
) -> DataFrame:
    """Count/scaled-sum state with a retraction sign: ``sign=-1``
    builds the DELETE delta of a CDC feed. Count and integer sum form
    an abelian GROUP (every state has an inverse), so a maintained
    rollup can apply deletes as negated inserts — unlike min/max,
    which are only monoids (no inverse: retracting the current max
    needs the runner-up) and must be recomputed or kept in an aux
    structure when deletes exist. That distinction is why this state
    carries fewer pieces than :func:`agg_state`."""
    v = F.col(value) if isinstance(value, str) else value
    s = F.lit(sign).cast("long")
    return df.groupBy(*keys).agg(
        (s * F.count(F.lit(1))).alias("n"),
        (s * F.sum(F.round(v * scale).cast("long"))).alias("sum_scaled"),
    )


def merge_delta_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold insert/delete delta states; keys whose live count reaches 0
    drop out of the rollup (fully retracted)."""
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    return (
        unioned.groupBy(*keys)
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_scaled").cast("long").alias("sum_scaled"),
        )
        .filter(F.col("n") > 0)
    )
