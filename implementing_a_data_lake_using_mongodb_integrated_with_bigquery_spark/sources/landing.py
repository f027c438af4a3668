"""Landed-response → raw-zone batch job (SURVEY §3.1, sources S1/S2).

The reference's hourly Lambda fetches REST responses, applies a
freshness predicate, tags each observation with its place, and inserts
into the raw zone — with failures dead-lettered
(``src/ingest_weather_data.py:49-132``). The HTTP fetch itself is
out-of-engine (no network in a Spark job's contract); everything AFTER
the responses land on storage is this batch job:

1. typed scan of the landing files (explicit schema — inference costs
   a pass and weakens pushdown),
2. timestamp parse + freshness gate (stale responses rejected, the
   reference's ``last_updated == expected`` predicate),
3. place tagging via broadcast dim join, with unknown places
   dead-lettered instead of silently dropped (the reference logs and
   skips, ``src/ingest_weather_data.py:70-74``),
4. hive-partitioned raw-zone write keyed by observation hour, so every
   downstream hourly job prunes to one partition before any IO.

At 100 TB the landing directory is thousands of JSON objects; the scan
parallelizes by file, the only wide operation is the (broadcast) dim
tag, and the write fans out by partition key — no corpus-sized shuffle
anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def land_batch(
    landed: DataFrame,
    places_dim: DataFrame,
    place_key: str,
    ts_col: str,
    fresh_pred: Column,
    raw_zone_path: str,
    dlq_path: str | None = None,
    hour_partition_col: str = "obs_hour",
) -> None:
    """Run the landing job: freshness gate → place tag → partitioned
    raw-zone parquet, rejects to a JSON dead-letter.

    ``fresh_pred`` is the freshness predicate over the parsed
    timestamp column (callers derive the expected bucket from data or
    wall clock — see ``operators.freshness``); rejects carry a
    ``reject_reason`` so poison responses are auditable, never
    silently dropped.
    """
    stale = landed.filter(~fresh_pred | F.col(ts_col).isNull()).withColumn(
        "reject_reason", F.lit("stale_or_unparseable_timestamp")
    )
    fresh = landed.filter(fresh_pred)

    dim = F.broadcast(places_dim)
    tagged = fresh.join(dim, place_key, "left")
    dim_cols = [c for c in places_dim.columns if c != place_key]
    known = tagged.filter(F.col(dim_cols[0]).isNotNull())
    unknown = (
        tagged.filter(F.col(dim_cols[0]).isNull())
        .drop(*dim_cols)
        .withColumn("reject_reason", F.lit(f"unknown_place:{place_key}"))
    )

    if dlq_path is not None:
        stale.unionByName(unknown).write.mode("overwrite").json(dlq_path)

    out = known.withColumn(
        hour_partition_col, F.date_format(F.date_trunc("hour", F.col(ts_col)), "yyyyMMddHH")
    )
    out.write.mode("overwrite").partitionBy(hour_partition_col).parquet(raw_zone_path)
