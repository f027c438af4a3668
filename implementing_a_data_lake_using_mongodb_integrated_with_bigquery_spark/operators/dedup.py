"""Exact deduplication operators.

Reference behavior re-expressed:

- ``check_duplicates`` (``src/process_insert_places_data.py:30-49``)
  dedups an incoming batch within itself via a running Python set AND
  against the warehouse via a fetched key list — here it is
  ``dropDuplicates`` + one anti-join.
- Duplicate audit (``src/process_insert_places_data.py:36-48``):
  group-by key having count>1.

Content-hash dedup generalizes this to LLM-corpus exact dedup: hash the
normalized payload, keep one representative per hash. All forms are a
single shuffle on the key/hash; map-side partial aggregation keeps the
shuffle small at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_against_target(
    batch: DataFrame, target: DataFrame, key: str | list[str]
) -> DataFrame:
    """Within-batch dedup + anti-join against existing target keys —
    the whole of ``check_duplicates`` in two operators."""
    keys = [key] if isinstance(key, str) else list(key)
    return batch.dropDuplicates(keys).join(target.select(*keys), keys, "left_anti")


def duplicate_audit(df: DataFrame, key: str | list[str]) -> DataFrame:
    """Keys appearing more than once, with their multiplicities
    (``src/process_insert_places_data.py:48`` as a group-by)."""
    keys = [key] if isinstance(key, str) else list(key)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .filter(F.col("occurrences") > 1)
    )


def exact_dedup(
    df: DataFrame,
    content_cols: list[str],
    order_col: str,
    hash_col: str = "content_hash",
) -> DataFrame:
    """Exact content dedup: md5 over the concatenated normalized content
    columns; keep the row with the smallest ``order_col`` per hash.

    Deterministic representative selection (min order key) instead of
    ``dropDuplicates``'s arbitrary first-seen, so results are stable
    across partitionings — required for oracle parity and for reruns on
    a cluster to be reproducible.
    """
    hashed = df.withColumn(
        hash_col, F.md5(F.concat_ws("\x1f", *[F.col(c) for c in content_cols]))
    )
    w = Window.partitionBy(hash_col).orderBy(F.col(order_col).asc())
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
