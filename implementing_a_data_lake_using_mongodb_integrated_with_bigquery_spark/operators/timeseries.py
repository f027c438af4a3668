"""Time-series spine generation and gap-filling (hypertable-style).

The reference's pipeline is an hourly observation feed with missing
polls (its freshness gate simply DROPS stale hours). The analytical
complement is gap-filling: materialize the complete per-key hour spine
and carry the last observation forward, so downstream window math sees
a dense series.

Scale shape: the spine is generated per key from that key's own
[min, max] bounds (``sequence`` + ``explode`` — no cross join against a
global calendar, so a key observed for one day doesn't explode into
the full corpus time range); the fill is one per-key ordered window.
Two shuffles total (bounds agg reused for the spine, the fill window),
both keyed by the series key — co-partitioned end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_gaps(
    series: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    step: int,
) -> DataFrame:
    """Dense spine + forward fill over an integer time axis (epoch
    micros by convention): one row per ``step`` between each key's
    first and last observation. Emits ``(key, time, <value> filled,
    was_gap)``; leading values are never null by construction (every
    spine starts at an observed point).
    """
    bounds = series.groupBy(key_col).agg(
        F.min(time_col).alias("_lo"), F.max(time_col).alias("_hi")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step).cast("long"))
        ).alias(time_col),
    )
    joined = spine.join(series, [key_col, time_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        time_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNull().alias("was_gap"),
    )


def ewma_flags(
    series: DataFrame,
    key_col: str,
    time_col: str,
    count_col: str,
    span: int = 16,
    spike_factor: int = 3,
) -> DataFrame:
    """Integer-exact EWMA (alpha = 1/2) spike detector over a per-key
    time-ordered series of BIGINT counts.

    Lags are over OBSERVED rows, not calendar periods: if the caller
    feeds a gapped series (e.g. hourly counts with zero-event hours
    absent), lag j means "j-th previous observation". Densify with
    :func:`fill_gaps` / a spine first when calendar-lag semantics are
    required.

    The classic recursive EWMA is float-accumulation-order-dependent
    and unusable under a value-hash oracle. With alpha = 1/2 the
    weights over the previous ``span`` observations are exact powers
    of two — ``w_j = 2^(span-j)`` for lag ``j`` — so the weighted sum
    is a BIGINT (``sum(lag_j * 2^(span-j))``), the normalizer is the
    constant ``2^span - 1``, and the spike test
    ``count > spike_factor * ewma`` becomes the EXACT integer
    comparison ``count * (2^span - 1) > spike_factor * weighted_sum``
    — no float boundary to flake on. The tail beyond ``span`` lags
    carries < 1/2^span of the mass and is truncated symmetrically on
    both engines.

    Emits only rows with a full ``span``-deep history (the lag window
    is null-free there): ``(key, time, count, ewma 6dp, is_spike)``.

    Scale shape: one per-key ordered window computes every lag —
    ``span`` lag() calls share a single window frame, so this is one
    key-partitioned shuffle regardless of span; state per row is
    ``span`` BIGINTs. No self-joins, no spine materialization.
    """
    if span < 1 or span > 62:
        raise ValueError("span must be in [1, 62] to stay in BIGINT range")
    w = Window.partitionBy(key_col).orderBy(time_col)
    norm = (1 << span) - 1
    weighted = None
    for j in range(1, span + 1):
        term = F.lag(F.col(count_col), j).over(w) * F.lit(1 << (span - j))
        weighted = term if weighted is None else weighted + term
    return (
        series.select(
            key_col,
            time_col,
            F.col(count_col).alias("_n"),
            weighted.cast("long").alias("_ws"),
        )
        .where(F.col("_ws").isNotNull())
        .select(
            key_col,
            time_col,
            F.col("_n").alias(count_col),
            F.round(F.col("_ws") / float(norm), 6).alias("ewma"),
            (F.col("_n") * norm > spike_factor * F.col("_ws")).alias("is_spike"),
        )
    )
