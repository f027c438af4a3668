"""Batch scans over the lake's parquet tables.

Spark-native equivalent of the reference's source operators S5/S6/S9
(MongoDB collection scans, ``src/process_insert_places_data.py:20-25``,
``src/extract_coordinates.py:17``): a columnar parquet scan with
Catalyst column pruning and predicate pushdown doing what the reference
did with hand-written Mongo projections.

All readers return lazy DataFrames — no driver-side materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one lake table. Column pruning / filter pushdown are applied
    by Catalyst based on what the downstream plan actually uses.

    Parquet TIMESTAMP(NANOS) columns (which Spark's reader rejects) are
    read as raw nanosecond longs and rebuilt as microsecond timestamps
    — same truncation DuckDB applies when narrowing TIMESTAMP_NS.
    """
    # Guard the two session confs correctness depends on, so results are
    # right even under a caller-provided vanilla SparkSession (the
    # verification driver builds its own): nanos-parquet readability and
    # UTC timestamp semantics (oracle parity for NTZ → epoch conversions).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # and pinned NTZ inference (see session.py) so event-time types are
    # identical under the driver's vanilla session
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def parallelize(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the cluster's parallelism — but ONLY
    when the input is under-split.

    The test fixtures are single-file/single-row-group parquet, which
    Spark cannot split — downstream stages would run as ONE task. A
    real 100 TB table is thousands of splittable files, so the
    compute-heavy operators (per-row expression-dense or UDF paths)
    call this to emulate that. On an already-well-split input this is a
    NO-OP: injecting a round-robin shuffle of a multi-split production
    table would be pure waste, so the repartition is gated on the
    actual split count. All engine outputs are partitioning-independent
    by construction, so this never changes results.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def load_json_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    multi_line: bool = False,
) -> DataFrame:
    """JSON scan for the raw zone (the reference's documents are nested
    JSON: seed files S3/S4 via multiLine, landing/event logs as
    JSON-lines). Pass an explicit schema in production — inference
    costs a full extra pass and weakens pushdown typing."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("multiLine", str(multi_line).lower()).json(path)
