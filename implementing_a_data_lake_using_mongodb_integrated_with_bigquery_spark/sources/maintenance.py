"""Lake maintenance: small-file compaction.

Streaming ingests and partitioned CDC merges (``streaming/cdc_merge``)
accrete many small files per partition; at 100 TB the resulting
per-file open/footer overhead dominates scan time and executor task
counts explode. Compaction rewrites a table (or one hive partition of
it) into files sized for the scanner — the routine maintenance job
every lakehouse runs (the reference never needs it only because its
warehouse is a managed service).

Sizing is computed from the ACTUAL on-disk bytes via the Hadoop
filesystem (works for any scheme Spark can read), not guessed: target
file count = ceil(bytes / target_file_bytes). The rewrite is a single
round-robin repartition — one shuffle, embarrassingly parallel, and
safe to run per-partition so a 100 TB table is compacted
partition-by-partition, never all at once.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the JVM Hadoop FS (scheme-aware:
    file://, s3a://, hdfs:// alike)."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Rewrite the parquet data at ``path`` into
    ``ceil(bytes/target_file_bytes)`` files at ``out_path``; returns
    the reader over the compacted result. Row-preserving by
    construction (pure repartition — no filter, no projection)."""
    df = spark.read.parquet(path)
    n_files = max(1, math.ceil(dir_bytes(spark, path) / target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def footer_row_count(path: str) -> int:
    """Total row count under ``path`` from parquet FOOTERS only — no
    data pages are read, so this is cheap enough to run as an invariant
    check around every maintenance rewrite."""
    import os

    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def parquet_file_count(path: str) -> int:
    import os

    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def compact_store(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
) -> dict:
    """IN-PLACE compaction of a streaming store directory via
    generation swap, guarded by a footer-count invariant.

    Streaming ingests (``streaming/ivf_ingest``) append one file-set
    per micro-batch forever; generation-swapped stores
    (``streaming/scd2_stream``, ``streaming/sketch_stream``) leave one
    file per shuffle partition. Either way the store drifts away from
    scanner-sized files, and at 100 TB the per-file footer/open
    overhead dominates probe latency. This rewrites the store beside
    itself (``<path>.compactN``), VERIFIES the new generation's footer
    row count equals the old one's before any destructive step, then
    rename-swaps — the same one-job/never-read-and-overwrite discipline
    as the stores' own batch writes. ``cluster_by`` hash-clusters rows
    (e.g. by IVF cell) so probe-side row-group stats stay selective,
    WITHOUT hive ``partitionBy`` (directory-partition inference would
    silently retype the column on read-back).

    Local-filesystem rename swap; an object-store deployment would swap
    a manifest/metadata pointer instead (same invariant, different
    commit primitive). Returns
    ``{files_before, files_after, rows}``.
    """
    import math
    import os
    import shutil

    rows_before = footer_row_count(path)
    files_before = parquet_file_count(path)
    df = spark.read.parquet(path)
    n_files = max(1, math.ceil(dir_bytes(spark, path) / target_file_bytes))
    if cluster_by:
        df = df.repartition(n_files, *cluster_by)
    else:
        df = df.repartition(n_files)
    tmp = f"{path}.compact{files_before}"
    df.write.mode("overwrite").parquet(tmp)
    rows_after = footer_row_count(tmp)
    if rows_after != rows_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compact_store invariant violated at {path}: "
            f"{rows_before} rows before, {rows_after} after — old "
            "generation left untouched"
        )
    # Swap discipline: the live path must always point at a COMPLETE
    # generation. Rename the old generation aside first (atomic), then
    # the new one in (atomic), and only then delete the old dir — a
    # crash between any two steps leaves either the old or the new
    # generation recoverable, never a missing store.
    old = f"{tmp}.old"
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # roll back: old generation restored
        raise
    shutil.rmtree(old)
    return {
        "files_before": files_before,
        "files_after": parquet_file_count(path),
        "rows": rows_after,
    }
