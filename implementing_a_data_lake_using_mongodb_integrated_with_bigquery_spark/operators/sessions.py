"""Gap-based sessionization (batch form of session windows).

Assigns every event a per-key session index: a new session starts when
the gap to the previous event exceeds ``gap``. One shuffle on the key,
one in-partition sort, two window passes (lag + running sum) — the
standard scale formulation. (Streaming variant: Spark's built-in
``session_window`` / ``applyInPandasWithState``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    tiebreak: str | None = None,
) -> DataFrame:
    """Add ``session_idx`` (1-based, per key, in time order).

    ``tiebreak`` (unique column) makes ordering total when timestamps
    can collide.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap_expr), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("session_idx", F.sum(new_session).over(wsum).cast("long"))
