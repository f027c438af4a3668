"""SCD Type-2 history construction from an event/change stream.

The reference's warehouse keeps only the LATEST observation per place
(UPDATE in place, ``src/process_insert_update_weather_data.py:146-162``)
— i.e. SCD Type 1, history destroyed. The lakehouse-native
generalization is Type 2: every attribute change becomes a validity
interval ``[valid_from, valid_to)`` with the open interval marking the
current version. Downstream as-of joins (``operators.asof``) can then
reconstruct the dimension as of ANY past time — which Type 1 cannot.

Shape: one shuffle on the entity key; change suppression and interval
construction are both windows over the same (key, time) ordering, so
Catalyst reuses a single sort-exchange. No state, no iteration: the
history is a pure function of the event stream, which also makes it
idempotent under replay (effectively-once without a transaction log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(key, attrs, valid_from, valid_to, is_current) version history.

    A new version opens when ANY tracked attribute differs (null-safe)
    from the previous observation of the same key; runs of identical
    observations are suppressed into one interval. ``tiebreak_col``
    totally orders simultaneous observations (determinism convention —
    required for oracle parity).
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.lag(ts_col).over(w).isNull()
    versions = df.withColumn("_open", first | changed).filter(F.col("_open"))
    # re-window over the surviving version rows only: valid_to of a
    # version is the NEXT version's start
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return versions.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
