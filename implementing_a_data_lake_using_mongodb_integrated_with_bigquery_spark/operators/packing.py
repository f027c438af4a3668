"""Sequence packing: GPT-style concat-and-chunk bin assignment.

Training corpora are materialized as fixed-budget context windows by
concatenating documents in a deterministic order and slicing the
stream every ``budget`` tokens (documents may span a boundary). A
document's bin is therefore ``floor(start_offset / budget)`` where
``start_offset`` is the exclusive running sum of token counts over
the pack order — an exact global prefix sum.

Scale shape (the part that matters at 100 TB): a naive
``SUM(...) OVER (ORDER BY ...)`` collapses the corpus into ONE task.
This is the two-phase distributed form, mirroring
``operators.windows.global_rank``:

1. ``repartitionByRange`` on the pack key + ``sortWithinPartitions``
   — one real distributed sort, the only full-data shuffle.
2. the within-partition exclusive cumsum runs as a NARROW
   ``mapInPandas`` scan over the already-sorted partitions (numpy
   ``cumsum`` per Arrow batch, a carried scalar between batches);
   per-partition token totals aggregate to |partitions| rows whose
   running total is broadcast back as each partition's global offset.

Both branches read the SAME range exchange (Spark reuses it; AQE
never re-coalesces an explicit-numPartitions repartition), so local
prefixes and partition totals are consistent by construction.

Determinism / engine parity: the pack order is the md5-hex order of
the document id (lexicographic on hex — portable, see
``operators.sampling``), token counts and offsets are exact BIGINTs,
and bin assignment is integer floor division — the DuckDB oracle
replays the identical arithmetic with a plain window cumsum.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    id_col: str,
    n_tok: Column,
    budget: int,
    salt: str = "pack",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tok, start, bin_id, end_bin_id, spans_boundary) — each
    document's position in the concatenated token stream and the
    context-window bin(s) it lands in. ``n_tok`` must be a
    non-negative BIGINT expression.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    h = F.substring(
        F.md5(
            F.concat(F.lit(salt), F.lit("\x1f"), F.col(id_col).cast("string"))
        ),
        1,
        16,
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        n_tok.cast("long").alias("_n_tok"),
        h.alias("_h"),
    )
    sorted_df = base.repartitionByRange(
        n_part, F.col("_h"), F.col("_id")
    ).sortWithinPartitions("_h", "_id")

    def local_cumsum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc = 0
        for pdf in batches:
            n = pdf["_n_tok"].to_numpy()
            cs = n.cumsum()
            out = pd.DataFrame(
                {
                    "_id": pdf["_id"].to_numpy(),
                    "_n_tok": n,
                    "_pid": pid,
                    "_local_excl": cs - n + acc,
                }
            )
            if len(n):
                acc += int(cs[-1])
            yield out

    # the _id field keeps the caller's id type (string doc keys pack
    # just as well as integer ones — hardcoding 'long' here silently
    # corrupted non-integer ids)
    id_type = df.schema[id_col].dataType.simpleString()
    local = sorted_df.mapInPandas(
        local_cumsum, f"_id {id_type}, _n_tok long, _pid int, _local_excl long"
    )
    # per-partition token totals from the same exchange (JVM-side);
    # the running-offset window is over |partitions| rows, not data
    totals = sorted_df.groupBy(
        F.spark_partition_id().alias("_pid")
    ).agg(F.sum("_n_tok").alias("_tot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_offset")
    )
    packed = local.join(F.broadcast(offsets), "_pid").withColumn(
        "_start", F.col("_local_excl") + F.col("_offset")
    )
    return packed.select(
        F.col("_id").alias(id_col),
        F.col("_n_tok").alias("n_tok"),
        F.col("_start").alias("start"),
        F.expr(f"_start div {budget}").alias("bin_id"),
        F.expr(
            f"(_start + greatest(_n_tok - 1, 0)) div {budget}"
        ).alias("end_bin_id"),
    ).withColumn("spans_boundary", F.col("bin_id") != F.col("end_bin_id"))
