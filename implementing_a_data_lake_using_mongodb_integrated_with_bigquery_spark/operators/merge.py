"""Upsert / merge operators (batch form of the CDC update path).

The reference performs upserts one record at a time: existence probe,
then INSERT or UPDATE DML
(``update_row``, ``src/process_insert_update_weather_data.py:131-162``).
On an immutable columnar store there is no in-place UPDATE, so the
set-oriented merge is: target ANTI-JOIN updates (drop superseded rows)
UNION updates — one shuffle, then an atomic partition overwrite at the
sink. ``last_write_wins`` collapses a batch of updates to the newest
version per key first, which the reference never needed (it processed
events strictly serially) but is mandatory once a micro-batch carries
multiple updates for one key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_write_wins(
    updates: DataFrame,
    key: str | list[str],
    version_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Newest row per key: deterministic row_number over
    (version desc, tiebreak desc). The in-batch collapse that makes a
    merge well-defined when one key appears multiple times."""
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(version_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    version_col: str | None = None,
) -> DataFrame:
    """Set-oriented MERGE: rows of ``target`` not superseded by
    ``updates``, plus ``updates`` (collapsed last-write-wins when
    ``version_col`` given). Column sets must match.

    Idempotent: applying the same update batch twice yields the same
    result — the reference achieved this with its per-row existence
    check (T3, ``src/process_insert_update_weather_data.py:97-101``).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if version_col is not None:
        updates = last_write_wins(updates, keys, version_col)
    cols = target.columns
    kept = target.join(updates.select(*keys), keys, "left_anti")
    return kept.select(*cols).unionByName(updates.select(*cols))
