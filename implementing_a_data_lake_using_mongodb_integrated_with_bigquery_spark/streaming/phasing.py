"""Deterministic multi-micro-batch replay staging.

A bounded streaming query is only oracle-able if the micro-batch
structure is a pure function of the data: each logical phase lands as
exactly ONE parquet file with strictly increasing mtimes, so the file
source's oldest-first ordering replays phase i as micro-batch i under
``maxFilesPerTrigger=1``. Shared by ``windowed.update_merge_phased``
and ``dedup_stream.incremental_dedup_stream``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def stage_phase_files(phases: list[DataFrame], input_dir: str) -> list[int]:
    """Write each phase as one parquet file in ``input_dir`` with
    fixed, strictly increasing mtimes (the file source sorts unread
    files oldest-first, so phase order == batch order). Returns the
    per-phase row counts read from the parquet footers — free, no
    Spark jobs — for the caller's batch-structure guard."""
    import tempfile

    import pyarrow.parquet as pq

    os.makedirs(input_dir, exist_ok=True)
    counts = []
    for i, ph in enumerate(phases):
        stage = tempfile.mkdtemp(prefix=f"phase{i}_", dir=os.path.dirname(input_dir))
        ph.coalesce(1).write.mode("overwrite").parquet(stage)
        parts = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        if len(parts) != 1:
            raise RuntimeError(f"phase {i}: expected 1 part file, got {parts}")
        dest = os.path.join(input_dir, f"phase-{i:03d}.parquet")
        os.link(os.path.join(stage, parts[0]), dest)
        t = 1_600_000_000 + 60 * i
        os.utime(dest, (t, t))
        counts.append(pq.ParquetFile(dest).metadata.num_rows)
    return counts


def check_batch_structure(progress: list, phase_counts: list[int], where: str) -> list:
    """Assert one data micro-batch per phase, arriving in phase order
    (by input-row counts) — a silent file-ordering or admission-control
    change must fail loudly, not hash-mismatch the oracle. Returns the
    data-batch progress entries."""
    data = [p for p in progress if p["numInputRows"] > 0]
    got = [p["numInputRows"] for p in data]
    if got != phase_counts:
        raise RuntimeError(
            f"{where}: batches saw {got} input rows but phases hold "
            f"{phase_counts} — file ordering or admission control diverged "
            "from the phase construction."
        )
    return data
