"""Nested-document flattening (raw zone → structured zone).

Re-expresses ``process_document``
(``src/process_insert_update_weather_data.py:83-93``):

- ``_id`` (ObjectId) → ``id`` string, the warehouse PK
- ``location`` struct dropped
- ``current.*`` star-expanded to top level
- ``current.condition`` struct reduced to its ``text``
- ``is_day`` int 0/1 → boolean (``:91``)
- ``last_updated`` "YYYY-MM-DD HH:MM" string → TIMESTAMP by appending
  ``":00"`` seconds (``:112``, parse convention ``src/ingest_weather_data.py:64``)

One narrow projection — no shuffle, fully codegen'd; at 100 TB this is
a map-only stage fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_weather(raw: DataFrame, passthrough: list[str] | None = None) -> DataFrame:
    """``passthrough``: extra top-level columns of ``raw`` carried
    through unchanged (e.g. the CDC event timestamp the update path's
    last-write-wins collapse orders by — carrying it through the
    projection keeps post-image↔timestamp pairing row-accurate, where
    a re-join by id would cross-pair multiple updates to one key)."""
    flat = raw.select(
        *(passthrough or []),
        F.col("_id").cast("string").alias("id"),
        F.col("place_id"),
        F.col("current.*"),
    )
    return (
        flat.withColumn("condition", F.col("condition.text"))
        .withColumn("is_day", F.col("is_day").cast("boolean"))
        .withColumn(
            "last_updated",
            F.to_timestamp(
                F.concat(F.col("last_updated"), F.lit(":00")),
                "yyyy-MM-dd HH:mm:ss",
            ),
        )
    )
