"""Tuned SparkSession factory.

Scale stance (designed for ~100 TB on a 1000-executor cluster, tested
on local[N]):

- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic join-strategy switching replace any
  hand-scheduling the reference did sequentially
  (cf. reference ``src/process_insert_update_weather_data.py:170-187``,
  one network round-trip per record — here one shuffle per stage).
- Arrow on: every pandas-UDF boundary is vectorized batch transfer.
- Broadcast threshold left at default (10 MB) — dimension tables
  (region/nation, the reference's 63-row places dim) broadcast
  automatically. ``F.broadcast`` hints appear at call sites ONLY for
  DOMAIN-BOUNDED relations (bounded dims, 1-row scalars,
  centroid/codebook tables, capped top-k) so the plan survives a
  stats-less file source; hints on data-proportional tables were
  removed by the r11 broadcast audit (a hint is obeyed at any size —
  executor OOM at 100×; the planner sizes those joins instead).
- Session timezone pinned to UTC so timestamp semantics are identical
  to the DuckDB oracle and stable across hosts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lakeflow",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("LAKEFLOW_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Pin parquet timestamp-inference: micros with isAdjustedToUTC=false
        # (the lake layout for events.ts) read as TIMESTAMP_NTZ, regardless
        # of the running Spark's default. A silent default flip would change
        # event-time semantics engine-wide; tests/conftest.py carries a
        # canary asserting the read type.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.driver.memory", os.environ.get("LAKEFLOW_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Partition discovery of the keyed merge stores (N_BUCKETS=64
        # hive dirs) crossed the default threshold (32) and ran as a
        # 64-TASK DISTRIBUTED JOB on every store read — 3-6 listing
        # jobs per streaming micro-batch at ~0.2s each. Driver-side
        # listing of a few hundred local directories is faster than a
        # cluster job; distributed listing only pays off at
        # thousands-of-paths object-store scale (r13 optimization
        # measurement; see OPTIMIZATION_r13.md).
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "256")
    )
    return builder.getOrCreate()
