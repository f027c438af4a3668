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
  → upsert merge (anti-join old out, union new) scoped to the hive
  partitions that contain updated keys, committed with dynamic
  partition overwrite. Updates whose key is absent are inserts (the
  reference's upsert fallback, ``:133-136``).
- delete path: deliberately ignored (``README.md:15`` — lake cleanup
  must not delete warehouse rows).
- T3 effectively-once: the PK anti-join makes re-delivered inserts
  no-ops, so at-least-once delivery + idempotent merge ≡ exactly-once
  on the target (plus Structured Streaming checkpointing for source
  offsets).

State lives in the target table itself (as in the reference, where
BigQuery was the state store) — no driver-side state, so a 1000-way
parallel ``foreachBatch`` works unchanged.

**Physical layout (100 TB design).** The target is hive-partitioned by
``part_bucket = pmod(xxhash64(id), N_BUCKETS)`` — a deterministic
function of the merge key. A micro-batch with k updated keys therefore
touches at most min(k, N_BUCKETS) partitions; the merge reads ONLY
those partitions (partition-pruned scan) and rewrites ONLY those
partitions (dynamic partition overwrite). A 100-row update batch
rewrites ~100 partition-files, never the whole fact table. A lakehouse
table format would turn the per-partition file swap into a
metadata-only MERGE commit; the partition scoping logic is identical.
The bucket column is physical layout, not schema: ``read_target``
drops it, and the write paths recompute it from ``id``.
"""

from __future__ import annotations

import os

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
KNOWN_OPS = ("insert", "update", "delete", "replace")

# physical layout: key-hash partition count of the fact target. Sized so
# one partition holds ~1/N of the table (at 100 TB with N=64 that's
# ~1.5 TB per bucket — a real deployment composes this with a date
# partition, part_date/part_bucket, to bound rewrite units further).
N_BUCKETS = 64
PART_COL = "part_bucket"


def with_bucket(df: DataFrame, key_col: str = "id") -> DataFrame:
    """Attach the deterministic partition bucket for ``key_col``.
    xxhash64 is stable across runs/sessions, so re-delivered events land
    in the same partition — required for idempotent merges."""
    return df.withColumn(
        PART_COL, F.pmod(F.xxhash64(F.col(key_col)), F.lit(N_BUCKETS)).cast("int")
    )


def _has_parquet(path: str) -> bool:
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def read_target(spark: SparkSession, path: str) -> DataFrame | None:
    """Logical view of the fact target: partition discovery over the
    hive layout, with the physical bucket column dropped."""
    if not os.path.exists(path) or not _has_parquet(path):
        return None
    df = spark.read.parquet(path)
    return df.drop(PART_COL) if PART_COL in df.columns else df


def _merge_touched_partitions(
    spark: SparkSession,
    target_path: str,
    newest: DataFrame,
    key_col: str = "id",
    touched: list[int] | None = None,
) -> None:
    """Partition-scoped MERGE: upsert ``newest`` into only the target
    partitions whose bucket contains an updated key, then commit with
    dynamic partition overwrite (untouched partitions' files are never
    read or rewritten). ``touched`` (≤ N_BUCKETS small ints) may be
    precomputed by the caller — e.g. folded into an already-running
    probe aggregate — to skip the discovery job here."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.merge import (
        upsert,
    )

    newest_b = with_bucket(newest, key_col)
    if touched is None:
        # ≤ N_BUCKETS small ints — a bounded metadata collect, not a
        # data collect (the driver holds partition IDs, never rows)
        touched = [r[0] for r in newest_b.select(PART_COL).distinct().collect()]
    target_raw = spark.read.parquet(target_path)
    target_touched = target_raw.filter(F.col(PART_COL).isin(touched)).drop(PART_COL)
    merged = with_bucket(upsert(target_touched, newest, key_col), key_col)
    # one shuffle on the bucket column → ONE file per touched bucket
    # per commit (r14): without it every upsert task writes into every
    # touched bucket dir — tasks × buckets small files per batch that
    # every LATER batch's target read must list and open again (the
    # init path at windowed.py already does this; the merge path was
    # the gap)
    merged = merged.repartition(F.col(PART_COL))
    # localCheckpoint truncates lineage so the write no longer reads the
    # path it overwrites; it materializes only the touched partitions
    # (a lakehouse MERGE makes this a metadata-only commit instead)
    merged = merged.localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PART_COL)
        .parquet(target_path)
    )


def split_by_operation(batch: DataFrame) -> dict[str, DataFrame]:
    """T1 dispatch: partition one CDC micro-batch by operation type.
    ``unknown`` collects events whose op is not in KNOWN_OPS."""
    return {
        "insert": batch.filter(F.col("operation_type").isin("insert", "replace")),
        "update": batch.filter(F.col("operation_type") == "update"),
        "delete": batch.filter(F.col("operation_type") == "delete"),
        # null-safe: a NULL op matches neither branch of isin, so it must
        # be routed to the DLQ explicitly, not silently dropped
        "unknown": batch.filter(
            F.col("operation_type").isNull()
            | ~F.col("operation_type").isin(*KNOWN_OPS)
        ),
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
    # pin the micro-batch ONCE: the merge references it through four
    # op-type branches plus isEmpty probes, and a foreachBatch plan
    # that references the batch N times re-scans the source N times
    # (and multiplies numInputRows N-fold, breaking the replay
    # batch-structure guard) — the scd2_stream.py precedent
    batch = batch.localCheckpoint(eager=True)
    parts = split_by_operation(batch)

    # ONE probe job for every per-batch gate: the former per-branch
    # isEmpty() calls each launched their own Spark job over the batch
    # (pure scheduling overhead at replay batch sizes — r13/r14
    # optimization measurements). One aggregate over the pinned batch,
    # broadcast-left-joined to the (domain-bounded) places dim's key
    # set, answers the three branch gates AND the two FK-violation
    # gates AND the update path's touched-bucket discovery:
    #   - orphan flags replicate fk_violations' left_anti null
    #     semantics exactly (no dim match — including NULL fk — means
    #     violation); the dim key set is distinct-ed so the left join
    #     cannot duplicate batch rows;
    #   - `tb` collects the buckets of FK-VALID update keys (the LWW
    #     collapse preserves the key set, so post-collapse buckets are
    #     identical) — ≤ N_BUCKETS small ints, bounded metadata.
    _unknown_cond = F.col("operation_type").isNull() | ~F.col(
        "operation_type"
    ).isin(*KNOWN_OPS)
    _is_ins = F.col("operation_type").isin("insert", "replace")
    _is_upd = F.col("operation_type") == "update"
    _orphan = F.col("__dim_pid").isNull()
    _dim_keys = places_dim.select(
        F.col("place_id").alias("__dim_pid")
    ).distinct()
    _probe = (
        batch.join(
            F.broadcast(_dim_keys),
            F.col("full_document.place_id") == F.col("__dim_pid"),
            "left",
        )
        .agg(
            F.coalesce(F.sum(_unknown_cond.cast("long")), F.lit(0)).alias("u"),
            F.coalesce(F.sum(_is_ins.cast("long")), F.lit(0)).alias("i"),
            F.coalesce(F.sum(_is_upd.cast("long")), F.lit(0)).alias("p"),
            F.coalesce(
                F.sum((_is_ins & _orphan).cast("long")), F.lit(0)
            ).alias("io"),
            F.coalesce(
                F.sum((_is_upd & _orphan).cast("long")), F.lit(0)
            ).alias("po"),
            F.sort_array(
                F.collect_set(
                    F.when(
                        _is_upd & ~_orphan,
                        F.pmod(
                            F.xxhash64(F.col("full_document._id")),
                            F.lit(N_BUCKETS),
                        ).cast("int"),
                    )
                )
            ).alias("tb"),
        )
        .first()
    )
    n_unknown, n_insert, n_update = _probe["u"], _probe["i"], _probe["p"]
    n_ins_orphans, n_upd_orphans = _probe["io"], _probe["po"]
    upd_touched = list(_probe["tb"])

    # poison events → DLQ (instead of the reference's os._exit(1))
    unknown = parts["unknown"]
    if n_unknown:
        unknown.withColumn("batch_id", F.lit(batch_id)).write.mode("append").json(
            os.path.join(dlq_path, "unknown_ops")
        )

    target = read_target(spark, target_path)

    # ---- insert path: dedup → PK anti → FK semi (+DLQ) → flatten → append
    ins_docs = parts["insert"].select("full_document.*")
    if n_insert:
        if target is not None:
            ins_docs = dedup_against_target(
                ins_docs, target.selectExpr("id as _id"), "_id"
            )
        else:
            ins_docs = ins_docs.dropDuplicates(["_id"])
        # post-dedup FK rejects are a SUBSET of the raw insert orphans
        # the probe already counted (dedup only removes rows), so a
        # zero raw count skips both the probe and the write; only a
        # batch that actually carries insert orphans still pays the
        # emptiness probe (dedup against the target can in principle
        # absorb them, and an empty JSON append would corrupt the DLQ
        # read-back)
        if n_ins_orphans:
            rejected = fk_violations(ins_docs, places_dim, "place_id")
            if not rejected.isEmpty():
                rejected.withColumn("batch_id", F.lit(batch_id)).write.mode(
                    "append"
                ).json(os.path.join(dlq_path, "fk_violations"))
        valid = fk_filter(ins_docs, places_dim, "place_id")
        flat = with_bucket(flatten_weather(valid))
        flat.write.mode("append").partitionBy(PART_COL).parquet(target_path)
        target = read_target(spark, target_path)

    # ---- update path: LWW collapse → FK check → upsert merge → swap
    upd_docs = parts["update"].select("ts", "full_document.*")
    if n_update:
        from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.merge import (
            last_write_wins,
        )

        # FK rejects dead-letter here exactly as on the insert path —
        # the same integrity failure must not vanish silently on
        # update. The update path checks PRE-collapse rows, so the
        # probe's orphan count IS the exact emptiness decision (no
        # per-branch isEmpty job — r14 probe fold).
        if n_upd_orphans:
            upd_rejected = fk_violations(upd_docs, places_dim, "place_id")
            upd_rejected.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).json(os.path.join(dlq_path, "fk_violations"))
        upd_docs = fk_filter(upd_docs, places_dim, "place_id")
        # ts rides THROUGH the flatten projection (passthrough) — the
        # earlier re-join by id cross-paired post-images with timestamps
        # when one batch carried two updates for one key, making the
        # LWW pick nondeterministic (regression-pinned in
        # tests/test_round10.py)
        flat_upd = flatten_weather(upd_docs, passthrough=["ts"])
        newest = last_write_wins(flat_upd, "id", "ts").drop("ts")
        if target is None:
            with_bucket(newest).write.mode("overwrite").partitionBy(
                PART_COL
            ).parquet(target_path)
        else:
            # touched buckets were computed in the probe aggregate
            # (FK-valid update keys; the LWW collapse preserves the
            # key set) — skips the per-batch distinct().collect() job
            _merge_touched_partitions(
                spark, target_path, newest, "id", touched=upd_touched
            )

    # ---- delete path: intentionally a no-op (README.md:15)


def cdc_foreach_batch(target_path: str, places_dim: DataFrame, dlq_path: str):
    """Bind configuration → the (batch_df, batch_id) callable for
    ``writeStream.foreachBatch``."""

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(batch_df, batch_id, target_path, places_dim, dlq_path)

    return _body


def cdc_merge_replay(
    spark: SparkSession,
    phases: list[DataFrame],
    places_dim: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Deterministic phased replay of the FULL CDC merge — the
    reference's daemon loop (T1 dispatch → insert path → LWW update
    path → delete no-op → unknown-op DLQ,
    ``src/process_insert_update_weather_data.py:166-187``) executed as
    real micro-batches: each phase lands as one parquet file with
    strictly increasing mtimes (``streaming/phasing.py``), and
    ``maxFilesPerTrigger=1`` maps phase i → micro-batch i, so the
    cross-batch state (the target table itself — inserts in batch 0
    are update targets in batch 1) is a pure function of the phase
    construction and hence relationally oracle-able.

    Returns (fact, dlq_fk, dlq_unknown) as batch DataFrames read back
    from the target and dead-letter sinks, each eagerly
    localCheckpoint-ed so the temp stores can be deleted. The
    phase→batch mapping is guarded both by row counts
    (``check_batch_structure``) and by file paths
    (``check_admission_log``)."""
    import shutil
    import tempfile

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.schemas import (
        CDC_EVENT,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.phasing import (
        check_admission_log,
        check_batch_structure,
        stage_phase_files,
    )

    root = tempfile.mkdtemp(prefix="cdc_replay_")
    input_dir = os.path.join(root, "input")
    target = os.path.join(root, "fact")
    dlq = os.path.join(root, "dlq")
    ckpt = os.path.join(root, "ckpt")
    try:
        counts = stage_phase_files(phases, input_dir)
        stream = (
            spark.readStream.schema(CDC_EVENT)
            .option("maxFilesPerTrigger", 1)
            .parquet(input_dir)
        )
        q = (
            stream.writeStream.foreachBatch(
                cdc_foreach_batch(target, places_dim, dlq)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        check_batch_structure(list(q.recentProgress), counts, "cdc_merge_replay")
        check_admission_log(ckpt, len(phases), "cdc_merge_replay")

        fact = read_target(spark, target)
        fact = fact.localCheckpoint(eager=True) if fact is not None else None

        def _read_dlq(sub: str, schema: str) -> DataFrame:
            path = os.path.join(dlq, sub)
            if _has_json(path):
                return spark.read.json(path).localCheckpoint(eager=True)
            return spark.createDataFrame([], schema)

        dlq_fk = _read_dlq(
            "fk_violations",
            "_id string, place_id string, "
            "current struct<temp_c: double>, batch_id long",
        )
        dlq_unknown = _read_dlq(
            "unknown_ops", "operation_type string, batch_id long"
        )
        return fact, dlq_fk, dlq_unknown
    finally:
        shutil.rmtree(root, ignore_errors=True)


def cdc_merge_restart(
    spark: SparkSession,
    phase1: DataFrame,
    phase2: DataFrame,
    places_dim: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """CDC merge across a checkpoint RESTART — the foreachBatch-sink
    member of the restart matrix (aggregates, joins, sessions, dedup:
    see the ``restart_*`` siblings in ``streaming/windowed.py`` /
    ``joins.py``). Run 1 consumes the phase-1 file (``availableNow``)
    and terminates; the phase-2 file then lands and a NEW query on the
    SAME checkpoint consumes ONLY it — restored source offsets must
    skip the already-committed file, which the dead-letter sinks make
    observable: re-processing phase 1 would append its FK rejects a
    second time (the target alone cannot tell — the merge is
    idempotent by design, reference T3). Admission is path-guarded
    per run and across the restart. Returns (fact, dlq_fk,
    dlq_unknown) like :func:`cdc_merge_replay`."""
    import shutil
    import tempfile

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.schemas import (
        CDC_EVENT,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.phasing import (
        check_admission_log,
        check_batch_structure,
        stage_phase_files,
    )

    root = tempfile.mkdtemp(prefix="cdc_restart_")
    input_dir = os.path.join(root, "input")
    target = os.path.join(root, "fact")
    dlq = os.path.join(root, "dlq")
    ckpt = os.path.join(root, "ckpt")

    def run_once() -> list:
        stream = (
            spark.readStream.schema(CDC_EVENT)
            .option("maxFilesPerTrigger", 1)
            .parquet(input_dir)
        )
        q = (
            stream.writeStream.foreachBatch(
                cdc_foreach_batch(target, places_dim, dlq)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return list(q.recentProgress)

    try:
        c1 = stage_phase_files([phase1], input_dir)
        prog1 = run_once()
        check_batch_structure(prog1, c1, "cdc_merge_restart run 1")
        # the restart: phase 2 lands AFTER run 1 committed its offsets
        c2 = stage_phase_files([phase2], input_dir, start=1)
        prog2 = run_once()
        check_batch_structure(prog2, c2, "cdc_merge_restart run 2")
        check_admission_log(ckpt, 2, "cdc_merge_restart")

        fact = read_target(spark, target)
        fact = fact.localCheckpoint(eager=True) if fact is not None else None

        def _read_dlq(sub: str, schema: str) -> DataFrame:
            path = os.path.join(dlq, sub)
            if _has_json(path):
                return spark.read.json(path).localCheckpoint(eager=True)
            return spark.createDataFrame([], schema)

        dlq_fk = _read_dlq(
            "fk_violations",
            "_id string, place_id string, "
            "current struct<temp_c: double>, batch_id long",
        )
        dlq_unknown = _read_dlq(
            "unknown_ops", "operation_type string, batch_id long"
        )
        return fact, dlq_fk, dlq_unknown
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _has_json(path: str) -> bool:
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".json") for f in files):
            return True
    return False


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
