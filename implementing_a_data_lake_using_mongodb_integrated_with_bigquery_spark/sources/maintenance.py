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
