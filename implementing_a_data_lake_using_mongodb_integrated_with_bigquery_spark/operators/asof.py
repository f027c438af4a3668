"""As-of (point-in-time) join — most recent right-side row at or
before each left-side row's timestamp, per key.

Spark has no built-in as-of join; the naive formulation (range
join / correlated subquery) is O(n·m) per key. This implementation is
the scale-correct union-tag construction: one shuffle on (key), one
sort within partitions, carried state via ``last(..., ignorenulls)``
over an unbounded-preceding window — O((n+m) log(n+m)) and no
cross-product, the same plan Flink/kdb-style engines use.

Generalizes the reference's lookup join J3 (exact-key broadcast probe,
``src/ingest_weather_data.py:60-62``) to temporal keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right_ts <= left_ts`` and equal join key(s); right columns come
    back prefixed ``asof_`` (null when no prior right row exists).

    ``tiebreak``: a unique right-side column ordering simultaneous
    right rows (latest wins deterministically).
    """
    keys = [on] if isinstance(on, str) else list(on)
    rcols = right_cols or [c for c in right.columns if c not in keys + [right_ts]]

    lhs = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lhs.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
        F.col(right_ts).alias("_r_ts"),
    )
    # at equal timestamps, right rows sort first (visible to the left
    # row: <= semantics); among simultaneous right rows, tiebreak asc
    # so the carried last() is the max-tiebreak row
    order = [F.col("_ts").asc(), F.col("_is_left").asc()]
    if tiebreak is not None:
        order.append(F.col(f"_r_{tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = lhs.unionByName(rhs).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in rcols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"asof_{right_ts}"),
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        F.col("_l.*"),
        *[F.col(f"asof_{c}") for c in rcols],
        F.col(f"asof_{right_ts}"),
    )
    return out


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    on: str | list[str],
    fact_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    attrs: list[str] | None = None,
) -> DataFrame:
    """Join facts to the SCD2 dimension version valid at each fact's
    timestamp (``valid_from <= ts < valid_to``, open interval = NULL
    ``valid_to``), without a range join: because SCD2 intervals are
    contiguous per key, the valid version is exactly the most recent
    ``valid_from`` at or before the fact — an as-of join.

    Cost is therefore the as-of union-tag plan (one shuffle on the
    key, one in-partition sort) instead of the O(facts × versions)
    interval cross-check a naive BETWEEN join plans. Simultaneous
    version openings (zero-length intervals) are resolved by carrying
    the largest ``valid_to`` — the one row whose interval is
    non-empty — matching the half-open-interval join semantics
    row-for-row.
    """
    keys = [on] if isinstance(on, str) else list(on)
    attrs = attrs or [
        c
        for c in history.columns
        if c not in set(keys) | {valid_from, valid_to, "is_current"}
    ]
    h = history.withColumn(
        "_vt_order",
        F.coalesce(
            F.unix_micros(F.col(valid_to).cast("timestamp")),
            F.lit((1 << 63) - 1),
        ),
    )
    return asof_join(
        facts,
        h,
        on,
        left_ts=fact_ts,
        right_ts=valid_from,
        right_cols=attrs + ["_vt_order"],
        tiebreak="_vt_order",
    ).drop("asof__vt_order")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Cogroup/Arrow formulation of :func:`asof_join` — the documented
    fallback shape for operators Spark's built-ins cannot express:
    ``left.groupBy(key).cogroup(right.groupBy(key)).applyInPandas``
    with a per-key ``pandas.merge_asof``.

    Semantics are pinned IDENTICAL to the JVM union-tag plan by unit
    test (same shuffle boundary too: one exchange per side on the
    key). The JVM path remains the default — this exists to validate
    the custom-operator escape hatch end-to-end, and as the template
    for per-key logic that genuinely needs Python (the Arrow transfer
    is per cogroup batch, never per row).
    """
    import pandas as pd
    from pyspark.sql import types as T

    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    fields = list(left.schema.fields)
    for c in rcols:
        fields.append(T.StructField(f"asof_{c}", right.schema[c].dataType))
    fields.append(T.StructField(f"asof_{right_ts}", right.schema[right_ts].dataType))
    schema = T.StructType(fields)
    left_cols = list(left.columns)
    sort_r = [right_ts] + ([tiebreak] if tiebreak else [])

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values(left_ts, kind="mergesort")
        r = r.sort_values(sort_r, kind="mergesort")
        rr = r[[right_ts] + rcols].rename(columns={c: f"asof_{c}" for c in rcols})
        rr[f"asof_{right_ts}"] = rr[right_ts]
        if rr.empty:
            out = l.copy()
            for c in rcols + [right_ts]:
                out[f"asof_{c}"] = None
            return out[[f.name for f in fields]]
        out = pd.merge_asof(
            l, rr, left_on=left_ts, right_on=right_ts,
            direction="backward", suffixes=("", "_r"),
        )
        return out[[f.name for f in fields]]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(lambda l, r: merge(l, r), schema=schema)
    )


def asof_tolerance_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    tolerance_us: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """:func:`asof_join` with a staleness bound (pandas
    ``merge_asof(tolerance=...)`` semantics): a match older than
    ``tolerance_us`` microseconds is nulled out, row kept. One extra
    map-only projection over the carried-state window — no additional
    shuffle."""
    keys = [on] if isinstance(on, str) else list(on)
    rcols = right_cols or [
        c for c in right.columns if c not in keys + [right_ts]
    ]
    out = asof_join(
        left, right, on, left_ts=left_ts, right_ts=right_ts,
        right_cols=rcols, tiebreak=tiebreak,
    )
    fresh = (
        F.unix_micros(F.col(left_ts).cast("timestamp"))
        - F.unix_micros(F.col(f"asof_{right_ts}").cast("timestamp"))
    ) <= F.lit(int(tolerance_us))
    # exclude exactly the columns asof_join attached — a prefix match
    # would silently drop a left-side column that happens to be named
    # asof_* (asof_join passes left columns through verbatim)
    attached = {f"asof_{c}" for c in [*rcols, right_ts]}
    keep = [c for c in out.columns if c not in attached]
    return out.select(
        *keep,
        *[
            F.when(fresh, F.col(f"asof_{c}")).alias(f"asof_{c}")
            for c in [*rcols, right_ts]
        ],
    )
