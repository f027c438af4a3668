"""Group-wise pandas transforms via ``applyInPandas`` (grouped map).

The third Python-boundary pattern (after scalar pandas UDFs and
``mapInPandas``): each key group arrives as one pandas DataFrame —
right for algorithms that need the whole group in memory (rank
normalization, per-group fitting, resampling). Groups are the unit of
parallelism, so this scales with |groups|; a single giant group is the
failure mode (pre-split or fall back to window functions).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_percent_rank(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group percent_rank of ``value_col`` (SQL semantics:
    (min_rank-1)/(n-1), ties share the rank; single-row groups → 0).
    Matches ``percent_rank() OVER (PARTITION BY g ORDER BY v)`` exactly
    — pinned against the DuckDB oracle."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            df.schema[group_col],
            df.schema[value_col],
            T.StructField("pct_rank", T.DoubleType()),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        ranks = pdf[value_col].rank(method="min")
        pr = (ranks - 1) / (n - 1) if n > 1 else ranks * 0.0
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                value_col: pdf[value_col],
                "pct_rank": pr.round(6),
            }
        )

    return (
        df.select(id_col, group_col, value_col)
        .groupBy(group_col)
        .applyInPandas(per_group, out_schema)
    )
