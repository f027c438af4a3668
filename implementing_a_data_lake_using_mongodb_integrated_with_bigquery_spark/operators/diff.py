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
