"""Physical layout management: partitioned and bucketed tables.

The reference's only layout discipline is hourly time-bucketing of
ingests (``src/ingest_weather_data.py:142``). At 100 TB, layout IS the
query plan:

- **Partitioned writes** (``partitionBy``): coarse pruning columns
  (date/hour, source, lang). A filter on the partition column prunes
  whole directories before any IO (``PartitionFilters`` in the scan).
- **Bucketed tables** (``bucketBy`` + ``saveAsTable``): pre-shuffled
  layout on the join/agg key. Two tables bucketed the same way join
  with ZERO exchanges — the shuffle is paid once at write time and
  amortized over every subsequent join. This is the engine's answer to
  the reference's "external state as join side" pattern: keep the fact
  and its key snapshot co-bucketed and the CDC merge's anti-join never
  reshuffles the target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet (hive-style) for partition
    pruning on the listed columns."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins/aggs on ``bucket_col`` between tables with identical
    bucketing run shuffle-free."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def write_json_projection(df: DataFrame, path: str, single_file: bool = True) -> None:
    """K5: JSON projection export (reference
    ``src/extract_coordinates.py:21-25`` dumps one coordinates JSON
    file for downstream lookup). ``coalesce(1)`` funnels the write
    through ONE task — correct for a small projected lookup artifact,
    deliberately NOT for bulk egress (use ``write_partitioned``);
    pass ``single_file=False`` to keep the input parallelism."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)
