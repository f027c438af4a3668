"""Binned range (interval-containment) join.

Generalizes the reference's equality-only join surface (SURVEY.md
§2.4; the reference's BigQuery DML matches rows by key, e.g.
``src/process_insert_update_weather_data.py``) to the non-equi
predicate ``lo <= v < hi`` — banding, tiering, and interval-lookup
joins a warehouse user writes as ``JOIN ... ON v BETWEEN lo AND hi``.

Spark has no native range-join strategy: a non-equi join plans as
BroadcastNestedLoopJoin when one side fits the broadcast threshold
and as a cartesian product otherwise — both quadratic-ish and the
second one fatal at 100 TB. The standard lowering (used by
Databricks' range-join hint and by interval libraries) turns it into
an EQUI-join on a coarse bin:

  point side:    bin = floor(v / w)                (one bin per row)
  interval side: explode bins floor(lo/w)..floor(hi/w)  (covered bins)
  equi-join on bin, then re-check the exact predicate.

Each point row carries exactly ONE bin, so a (point, interval) pair
can only meet in that bin — no duplicate pairs, no dedup pass. The
join becomes a hash/sort-merge equi-join Catalyst and AQE can
shuffle-partition, broadcast, or skew-split like any other, so it
survives big × big inputs. Cost knob: ``bin_width`` should be near
the median interval width — too small explodes the interval side,
too large degrades toward the cartesian check within a bin.

Overlapping intervals are fully supported (a point matches every
containing interval) — precisely the case plain ``floor(v/w)``
bucketing cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    val_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to every interval with
    ``lo <= points[val_col] < hi`` (half-open), lowered to an
    equi-join on ``floor(value / bin_width)``.

    Intervals must satisfy ``lo <= hi``. The interval side grows by
    one row per covered bin (``(hi - lo) / bin_width + 1``); the point
    side never duplicates. ``how`` supports 'inner' and 'left'
    (unmatched points kept with NULL interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type: {how!r}")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")

    p = points.withColumn(_BIN, F.floor(F.col(val_col) / bin_width).cast("long"))
    # floor(hi/w) is kept even when hi sits exactly on a bin boundary
    # (half-open interval can't reach it): one spurious bin per
    # interval is cheaper than an epsilon dance on doubles — the exact
    # predicate below discards it.
    iv = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    contained = (F.col(val_col) >= F.col(lo_col)) & (F.col(val_col) < F.col(hi_col))
    if how == "inner":
        return p.join(iv, on=_BIN, how="inner").where(contained).drop(_BIN)
    # left: the exact predicate must ride INSIDE the join condition,
    # not a post-filter, or unmatched-point rows would be dropped.
    iv_cols = [c for c in intervals.columns]
    renamed = iv.select(F.col(_BIN).alias(_BIN + "_r"), *iv_cols)
    cond = (F.col(_BIN) == F.col(_BIN + "_r")) & contained
    return p.join(renamed, on=cond, how="left").drop(_BIN, _BIN + "_r")


def interval_overlap_join(
    intervals: DataFrame,
    key_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Self-join intervals within each ``key_col`` group on STRICT
    overlap (``a.start < b.end AND b.start < a.end``), returning each
    unordered pair once with its overlap length.

    Output: ``(key, a_id, b_id, a_start, a_end, b_start, b_end,
    overlap)`` with ``a_id < b_id`` — overlap is
    ``least(ends) - greatest(starts)`` in the start/end unit (strictly
    positive by the predicate, exact when starts/ends are integers).

    Scale shape: the naive formulation is a per-key non-equi self-join
    (quadratic, and Catalyst plans it as a nested-loop). This lowers
    it to an EQUI-join on ``(key, bin)``: every interval explodes to
    the fixed-width bins it covers; two overlapping intervals share
    every bin their intersection touches, so the pair is found — and
    it is KEPT exactly once, in the bin containing the later start
    (``floor(greatest(a.start, b.start) / bin_width)``), which both
    intervals necessarily cover. No global dedup shuffle: uniqueness
    is a per-row filter. The join is a plain hash equi-join AQE can
    broadcast/skew-split; cost knob ``bin_width`` should sit near the
    typical interval length (too small explodes rows, too large
    degrades to per-bin cartesian checks).

    Intervals must satisfy ``start <= end``; integer start/end
    columns (e.g. epoch micros) keep the arithmetic exact.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")

    binned = intervals.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("_id"),
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width).cast("long"),
                F.floor(F.col(end_col) / bin_width).cast("long"),
            )
        ).alias(_BIN),
    )
    a = binned.select(
        F.col("_k"),
        F.col(_BIN),
        F.col("_id").alias("a_id"),
        F.col("_s").alias("a_start"),
        F.col("_e").alias("a_end"),
    )
    b = binned.select(
        F.col("_k"),
        F.col(_BIN),
        F.col("_id").alias("b_id"),
        F.col("_s").alias("b_start"),
        F.col("_e").alias("b_end"),
    )
    owner_bin = F.floor(
        F.greatest(F.col("a_start"), F.col("b_start")) / bin_width
    ).cast("long")
    return (
        a.join(b, on=["_k", _BIN], how="inner")
        .where(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end"))
            & (F.col(_BIN) == owner_bin)
        )
        .select(
            F.col("_k").alias(key_col),
            "a_id",
            "b_id",
            "a_start",
            "a_end",
            "b_start",
            "b_end",
            (
                F.least(F.col("a_end"), F.col("b_end"))
                - F.greatest(F.col("a_start"), F.col("b_start"))
            ).alias("overlap"),
        )
        .drop(_BIN)
    )
