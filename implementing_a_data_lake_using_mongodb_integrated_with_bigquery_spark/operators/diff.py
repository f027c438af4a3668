"""Snapshot diff — change-data-feed between two states of a table.

The reference reconstructs "what changed" by replaying the Mongo
change stream (SURVEY.md §2.7, ``src/process_insert_update_weather_
data.py``); when no stream exists (backfills, vendor drops, restored
snapshots) the lakehouse needs the inverse operator: given two full
snapshots, derive the change feed. This is the standard
added/removed/changed classification every incremental-sync and
audit pipeline is built on.

Scale shape: one full-outer sort-merge join keyed on the primary key —
both sides shuffle exactly once on the key and nothing else moves.
Column comparison is null-safe and happens post-join per row (codegen,
no Python). With both snapshots bucketed on the key
(``sources.layout``) the exchange disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """(keys, change_type, old_<c>, new_<c>) for every key present in
    either snapshot: ``added`` (new only), ``removed`` (old only),
    ``changed`` (present in both, any compared column differs
    null-safely), ``unchanged`` (kept only when asked)."""
    compare = compare_cols or [c for c in old.columns if c not in key_cols]
    o = old.select(
        *key_cols,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    j = o.join(n, key_cols, "full_outer")

    differs = F.lit(False)
    for c in compare:
        differs = differs | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *key_cols,
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in compare],
        *[F.col(f"new_{c}") for c in compare],
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def merkle_bucket_summary(
    df: DataFrame,
    key_col: str,
    payload: Column,
    n_buckets: int = 64,
) -> DataFrame:
    """Bucket-level reconciliation summary: ``(bucket, n_rows,
    checksum)`` with an order-independent integer checksum per key
    bucket — the Merkle-tree leaf level of anti-entropy protocols
    (Dynamo/Cassandra repair): two replicas compare ``n_buckets``
    summary rows instead of the full table, then row-diff ONLY the
    diverged buckets. The scale-path companion of ``snapshot_diff``,
    which moves every row of both sides.

    The checksum is the SUM of the first 10 hex chars of
    ``md5(key || '|' || payload)`` parsed as integers — engine-portable
    (Spark ``conv``, DuckDB ``('0x'||…)::BIGINT``, same convention as
    ``operators.sketches``), order-independent because integer SUM is
    commutative, and overflow-safe: 40-bit terms leave 2^23 rows of
    headroom per bucket before BIGINT wraps (and a wrap on BOTH sides
    still compares correctly unless collisions align). ``payload``
    must be built from strings/integers only — float-to-string
    formatting differs across engines.
    """
    s = F.concat_ws("|", F.col(key_col).cast("string"), payload)
    term = F.conv(F.substring(F.md5(s), 1, 10), 16, 10).cast("long")
    return (
        df.groupBy((F.col(key_col) % n_buckets).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(term).cast("long").alias("checksum"),
        )
    )
