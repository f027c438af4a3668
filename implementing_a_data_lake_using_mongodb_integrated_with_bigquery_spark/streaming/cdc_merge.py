"""Structured Streaming CDC consumption — the reference's daemon leg.

Re-expresses ``src/process_insert_update_weather_data.py:166-187`` (the
change-stream loop) as ``readStream → foreachBatch(merge)``:

- T1 dispatch: one batch split by ``operation_type`` instead of a
  per-event ``if`` ladder; unknown ops go to a dead-letter sink instead
  of ``os._exit(1)`` (the reference's poison-event halt, ``:184-187``).
- insert path (``insert_row``, ``:97-127``): within-batch dedup → PK
  anti-join vs target → FK semi-join vs dim (violations → DLQ) →
  flatten → append. 2-3 RPCs/record become one joined batch.
- update path (``update_row``, ``:131-162``): last-write-wins collapse
  → upsert merge (anti-join old out, union new) → atomic
  rewrite-and-swap of the target directory. Updates whose key is
  absent are inserts (the reference's upsert fallback, ``:133-136``).
- delete path: deliberately ignored (``README.md:15`` — lake cleanup
  must not delete warehouse rows).
- T3 effectively-once: the PK anti-join makes re-delivered inserts
  no-ops, so at-least-once delivery + idempotent merge ≡ exactly-once
  on the target (plus Structured Streaming checkpointing for source
  offsets).

State lives in the target table itself (as in the reference, where
BigQuery was the state store) — no driver-side state, so a 1000-way
parallel ``foreachBatch`` works unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup import (
    dedup_against_target,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.flatten import (
    flatten_weather,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.integrity import (
    fk_filter,
    fk_violations,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.merge import (
    upsert,
)

KNOWN_OPS = ("insert", "update", "delete", "replace")


def read_target(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.exists(path) or not any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return None
    return spark.read.parquet(path)


def _atomic_overwrite(df: DataFrame, path: str) -> None:
    """Write to a sibling temp dir, then swap — the pure-parquet stand-in
    for a transactional MERGE (a lakehouse table format would make this
    a metadata-only commit)."""
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def split_by_operation(batch: DataFrame) -> dict[str, DataFrame]:
    """T1 dispatch: partition one CDC micro-batch by operation type.
    ``unknown`` collects events whose op is not in KNOWN_OPS."""
    return {
        "insert": batch.filter(F.col("operation_type").isin("insert", "replace")),
        "update": batch.filter(F.col("operation_type") == "update"),
        "delete": batch.filter(F.col("operation_type") == "delete"),
        "unknown": batch.filter(~F.col("operation_type").isin(*KNOWN_OPS)),
    }


def apply_cdc_batch(
    batch: DataFrame,
    batch_id: int,
    target_path: str,
    places_dim: DataFrame,
    dlq_path: str,
) -> None:
    """The foreachBatch body: idempotent CDC merge of one micro-batch
    into the parquet fact target. Update events must carry the full
    post-image in ``full_document`` (design choice per SURVEY.md §7
    risk 3 — avoids the reference's per-event re-fetch RPC)."""
    spark = batch.sparkSession
    parts = split_by_operation(batch)

    # poison events → DLQ (instead of the reference's os._exit(1))
    unknown = parts["unknown"]
    if not unknown.isEmpty():
        unknown.withColumn("batch_id", F.lit(batch_id)).write.mode("append").json(
            os.path.join(dlq_path, "unknown_ops")
        )

    target = read_target(spark, target_path)

    # ---- insert path: dedup → PK anti → FK semi (+DLQ) → flatten → append
    ins_docs = parts["insert"].select("full_document.*")
    if not ins_docs.isEmpty():
        if target is not None:
            ins_docs = dedup_against_target(
                ins_docs, target.selectExpr("id as _id"), "_id"
            )
        else:
            ins_docs = ins_docs.dropDuplicates(["_id"])
        rejected = fk_violations(ins_docs, places_dim, "place_id")
        if not rejected.isEmpty():
            rejected.withColumn("batch_id", F.lit(batch_id)).write.mode("append").json(
                os.path.join(dlq_path, "fk_violations")
            )
        valid = fk_filter(ins_docs, places_dim, "place_id")
        flat = flatten_weather(valid)
        flat.write.mode("append").parquet(target_path)
        target = read_target(spark, target_path)

    # ---- update path: LWW collapse → FK check → upsert merge → swap
    upd_docs = parts["update"].select("ts", "full_document.*")
    if not upd_docs.isEmpty():
        upd_docs = fk_filter(upd_docs, places_dim, "place_id")
        flat_upd = flatten_weather(upd_docs.drop("ts")).join(
            upd_docs.select(F.col("_id").cast("string").alias("id"), "ts"), "id"
        )
        if target is None:
            merged = flat_upd.drop("ts")
            _atomic_overwrite(merged.dropDuplicates(["id"]), target_path)
        else:
            from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.merge import (
                last_write_wins,
            )

            newest = last_write_wins(flat_upd, "id", "ts").drop("ts")
            merged = upsert(target, newest, "id")
            _atomic_overwrite(merged, target_path)

    # ---- delete path: intentionally a no-op (README.md:15)


def cdc_foreach_batch(target_path: str, places_dim: DataFrame, dlq_path: str):
    """Bind configuration → the (batch_df, batch_id) callable for
    ``writeStream.foreachBatch``."""

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(batch_df, batch_id, target_path, places_dim, dlq_path)

    return _body


def start_cdc_stream(
    spark: SparkSession,
    events_dir: str,
    target_path: str,
    places_dim: DataFrame,
    dlq_path: str,
    checkpoint_dir: str,
):
    """Wire the file-based CDC source (JSON events with the CDC_EVENT
    schema) through the merge. ``availableNow`` in tests; a real
    deployment uses a continuous trigger + Kafka/CDC-log source."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.schemas import (
        CDC_EVENT,
    )

    stream = (
        spark.readStream.schema(CDC_EVENT)
        .option("maxFilesPerTrigger", 16)
        .json(events_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            cdc_foreach_batch(target_path, places_dim, dlq_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
