"""Time-window aggregation and top-k-per-group operators.

The reference's ingest cadence is a 1-hour tumbling window
(EventBridge ``cron(10 * * * ? *)``, ``README.md:76-78``) with the
current-hour freshness predicate acting as the window assignment
(``src/ingest_weather_data.py:142``). Batch form here; the streaming
form (with watermarks) lives in ``streaming/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Tumbling-window aggregation: window(ts, duration) × group_cols.
    Emits window_start/window_end timestamp columns."""
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """row_number over (group, order) ≤ k — the set-oriented form of the
    reference's early-exit best-candidate scan
    (``src/ingest_places_data.py:60-62``, limit-1 semantics).
    Pass fully deterministic ``order_by`` (include a unique tiebreak)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def inactivity_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak: str,
    min_gap_seconds: int,
) -> DataFrame:
    """Gaps-and-islands: per-key spans of inactivity longer than
    ``min_gap_seconds`` — (key, gap_start_us, gap_end_us, gap_us) for
    every consecutive-event pair further apart than the threshold.

    One shuffle on the key + one in-partition sort (lag window); the
    gap is computed in exact epoch-micros integers (no engine-variant
    second truncation), and the sort carries a unique tiebreak column
    so lag() is deterministic under equal timestamps.
    """
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(t.asc(), F.col(order_tiebreak).asc())
    prev = F.lag(t).over(w)
    return (
        df.select(F.col(key_col), t.alias("_t"), prev.alias("_prev"))
        .where(F.col("_prev").isNotNull())
        .where(F.col("_t") - F.col("_prev") > min_gap_seconds * 1_000_000)
        .select(
            key_col,
            F.col("_prev").alias("gap_start_us"),
            F.col("_t").alias("gap_end_us"),
            (F.col("_t") - F.col("_prev")).alias("gap_us"),
        )
    )


def max_concurrency(
    df: DataFrame,
    start_us_col: str,
    end_us_col: str,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Peak number of simultaneously-open half-open intervals
    ``[start, end)`` per time bucket, via the classic +1/-1 sweep —
    WITHOUT a global single-task window.

    Distributed formulation: change events are bucketed by time; the
    running sum is split into (a) a per-bucket prefix sum (window
    partitioned BY BUCKET — parallel across buckets) plus (b) an
    exclusive running offset of per-bucket nets (a window over the
    BUCKET TABLE, thousands of rows, not the data). At 100 TB the only
    unpartitioned step runs on ~rows/bucket-count reduced input.

    Tie semantics: ends sort before starts at the same instant
    (half-open intervals never overlap at a shared endpoint), and the
    RANGE window frame makes ties contribute together, so the peak is
    evaluated after ALL changes at an instant — deterministic with no
    tiebreak column needed.
    """
    s = df.select(F.col(start_us_col).alias("t"), F.lit(1).alias("delta"))
    e = df.select(F.col(end_us_col).alias("t"), F.lit(-1).alias("delta"))
    d = s.unionAll(e).withColumn("bucket", F.expr(f"t div {bucket_us}"))

    nets = d.groupBy("bucket").agg(F.sum("delta").alias("net"))
    w_off = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = nets.select(
        "bucket", F.coalesce(F.sum("net").over(w_off), F.lit(0)).alias("offset")
    )

    w_run = Window.partitionBy("bucket").orderBy(F.col("t").asc(), F.col("delta").asc())
    running = d.withColumn("run_local", F.sum("delta").over(w_run)).join(
        offsets, "bucket"
    )
    return (
        running.groupBy("bucket")
        .agg(F.max(F.col("run_local") + F.col("offset")).alias("peak"))
        .select(
            (F.col("bucket") * bucket_us).alias("bucket_us"),
            F.col("peak").cast("long").alias("peak"),
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_us_col: str,
    width_us: int,
    slide_us: int,
    sums: dict[str, "F.Column"],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Overlapping (sliding) time windows via pane slicing — the
    Flink/Scotty two-level trick, not per-event window explosion.

    The naive formulation replicates EVERY event into width/slide
    windows before aggregating (a width/slide × corpus blow-up in the
    shuffle). Instead: (1) aggregate into non-overlapping panes of the
    slide length — map-side combined, shuffle bounded by |panes|;
    (2) replicate only the PANE PARTIALS into the windows containing
    them; (3) re-combine. At 100 TB with 1h/15m windows the ×4
    replication applies to thousands of pane rows, not billions of
    events. Only decomposable aggregates (count/sum/min/max) qualify —
    which is also exactly the set that is order-independent and hence
    oracle-checkable.

    ``sums``: output name → integer column expression (scaled-integer
    convention) summed over the window. Requires width % slide == 0.
    Emits complete and partial windows alike (every window any event
    falls in), with ``window_start_us`` = inclusive window start.
    """
    if width_us % slide_us != 0:
        raise ValueError("width_us must be a multiple of slide_us")
    panes_per_window = width_us // slide_us
    gcols = group_cols or []

    pane = (
        df.select(
            *gcols,
            F.col(ts_us_col).alias("_t"),
            *[expr.alias(f"_s_{name}") for name, expr in sums.items()],
        )
        .withColumn("_pane", F.expr(f"_t div {slide_us}"))
        .groupBy(*gcols, "_pane")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(f"_s_{name}").alias(f"_ps_{name}") for name in sums],
        )
    )
    exploded = pane.select(
        *gcols,
        F.explode(
            F.sequence(F.col("_pane") - (panes_per_window - 1), F.col("_pane"))
        ).alias("_k"),
        "_n",
        *[F.col(f"_ps_{name}") for name in sums],
    )
    return (
        exploded.groupBy(*gcols, "_k")
        .agg(
            F.sum("_n").alias("n_events"),
            *[F.sum(f"_ps_{name}").alias(name) for name in sums],
        )
        .select(
            *gcols,
            (F.col("_k") * slide_us).alias("window_start_us"),
            F.col("n_events"),
            *[F.col(name) for name in sums],
        )
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global rank (1-based, dense total order) WITHOUT a
    single-partition window.

    A bare ``row_number().over(Window.orderBy(...))`` collapses the
    whole table into ONE task — the classic global-sort scale-killer.
    This is the two-phase form a 1000-executor cluster needs:

    1. ``repartitionByRange`` + ``sortWithinPartitions`` — a real
       distributed sort (range partitioner, each task sorts its slice).
    2. the local (within-partition) position comes from
       ``monotonically_increasing_id``'s lower 33 bits — a plain
       per-partition counter over the already-sorted rows, NO
       ``Window.partitionBy(_pid)`` (which would re-hash-exchange the
       entire table right after the range shuffle). A
       |partitions|-row count aggregate's running total is broadcast
       back as each partition's global offset.

    The whole table moves exactly ONCE (the range shuffle), then the
    position-stamped result is PINNED with an eager
    ``localCheckpoint`` before it fans out to the offsets branch and
    the main branch. Exchange reuse alone is NOT a correctness
    guarantee here: inside a larger plan (observed under a
    crossJoin-of-own-aggregate tree) Catalyst can compile the two
    branches as separate exchanges, each re-running the range
    sampler, and a boundary that moves by even one row between the
    samples breaks rank = offset + local. The checkpoint freezes one
    materialization that both branches read, making consistency a
    construction property instead of an optimizer courtesy; it also
    truncates lineage, so downstream reuse of the ranked table is
    cheap.

    ``order_cols`` must be a total order (include a unique tiebreak) —
    then the output rank is unique and independent of partition
    boundaries, so the operator is deterministic even though the range
    sampler isn't pinned.
    """
    reserved = {"_pid", "_local", "_offset", "_cnt"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"global_rank: rename columns {clash}")
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    sorted_df = df.repartitionByRange(n_part, *cols).sortWithinPartitions(*cols)
    # monotonically_increasing_id = (partition id << 33) + row number
    # within partition: the lower 33 bits are the sorted local position
    local_mask = (1 << 33) - 1
    with_pid = (
        sorted_df.withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local",
            F.monotonically_increasing_id().bitwiseAND(F.lit(local_mask)) + 1,
        )
        .localCheckpoint(eager=True)
    )
    # per-partition counts -> exclusive running total = rank offset;
    # |partitions| rows, broadcast back onto the fact side. The running
    # sum's single-partition window is over |partitions| rows, not data.
    offsets = (
        with_pid.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_offset") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_offset")
    )


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact per-group rank (1-based) WITHOUT per-group single-task
    sorts — the group-keyed twin of :func:`global_rank`.

    ``row_number().over(Window.partitionBy(group))`` hash-shuffles on
    the group key alone, so a LOW-CARDINALITY key (a handful of event
    types over a fact table) collapses into a few fact-sized
    single-task sorts — the partitioned cousin of the global-window
    scale-killer. Here the range partitioner sorts on the COMPOSITE
    (group, order) key, so one group spreads over many partitions and
    every task handles ~|data|/|partitions| rows regardless of group
    cardinality or skew:

    1. ``repartitionByRange(group ++ order)`` + ``sortWithinPartitions``
       — groups land contiguously in range order, large groups span
       partitions.
    2. local sorted position from ``monotonically_increasing_id``'s
       lower 33 bits; the stamped table is PINNED with an eager
       ``localCheckpoint`` (same reasoning as global_rank: two branches
       must read ONE materialization, not two range-sampler runs).
    3. a per-(partition, group) cell table — at most
       |partitions| + |groups-that-span| rows because groups are
       contiguous — yields, per cell, the group's rows in earlier
       partitions (window over the CELL table, partitioned by group)
       and the group's first local position in this partition; both
       broadcast back. rank = earlier_partitions_count
       + (local − group_start_in_partition + 1).

    ``group_cols ++ order_cols`` must be a total order (include a
    unique tiebreak) — then ranks are unique per group and independent
    of partition boundaries.
    """
    reserved = {"_pid", "_local", "_goff", "_cnt", "_start"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"grouped_rank: rename columns {clash}")
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in [*group_cols, *order_cols]]
    sorted_df = df.repartitionByRange(n_part, *cols).sortWithinPartitions(*cols)
    local_mask = (1 << 33) - 1
    with_pid = (
        sorted_df.withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local",
            F.monotonically_increasing_id().bitwiseAND(F.lit(local_mask)) + 1,
        )
        .localCheckpoint(eager=True)
    )
    cells = with_pid.groupBy("_pid", *group_cols).agg(
        F.count(F.lit(1)).alias("_cnt"), F.min("_local").alias("_start")
    )
    # rows of this group in earlier partitions, minus the group's
    # in-partition start offset — one additive correction per cell
    w_g = Window.partitionBy(*group_cols).orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = cells.select(
        "_pid",
        *group_cols,
        (
            F.coalesce(F.sum("_cnt").over(w_g), F.lit(0))
            - (F.col("_start") - 1)
        ).alias("_goff"),
    )
    return (
        with_pid.join(F.broadcast(offsets), ["_pid", *group_cols])
        .withColumn(rank_col, (F.col("_goff") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_goff")
    )


def grouped_ntile_exact(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    buckets: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact per-group equal-frequency binning (SQL ``NTILE(k) OVER
    (PARTITION BY group)`` semantics: within each group the first
    ``n mod k`` buckets hold one extra row) built on
    :func:`grouped_rank` — the group-keyed twin of :func:`ntile_exact`,
    safe for LOW-CARDINALITY group keys where a partitioned window
    would collapse into a few fact-sized single-task sorts. Per-group
    totals are a |groups|-row aggregate joined back by broadcast.

    The bucket index is pure BIGINT arithmetic (``div``, the repo's
    integer-division discipline) — the earlier double-divide+floor
    form was exact only below ~2^53 ranks."""
    reserved = {"_grank", "_gn"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"grouped_ntile_exact: rename columns {clash}")
    ranked = grouped_rank(df, group_cols, order_cols, rank_col="_grank")
    totals = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_gn")
    )
    joined = ranked.join(F.broadcast(totals), group_cols)
    bucket = F.expr(
        f"CASE WHEN _gn % {buckets} = 0 THEN (_grank - 1) div (_gn div {buckets}) "
        f"WHEN _grank - 1 < (_gn div {buckets} + 1) * (_gn % {buckets}) "
        f"THEN (_grank - 1) div (_gn div {buckets} + 1) "
        f"ELSE _gn % {buckets} + (_grank - 1 - (_gn div {buckets} + 1) * (_gn % {buckets})) "
        f"div (_gn div {buckets}) END"
    )
    return (
        joined.withColumn(bucket_col, (bucket + 1).cast("long"))
        .drop("_grank", "_gn")
    )


def grouped_percentile_exact(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    ps: dict[str, float],
) -> DataFrame:
    """EXACT interpolated percentiles per group WITHOUT per-group
    buffering — the scale-safe replacement for Spark's
    ``percentile()`` aggregate, whose buffer holds EVERY value of a
    group (an OOM at 100 TB group sizes; the aggregation-buffer twin
    of the partitioned-window scale-killer).

    SQL PERCENTILE_CONT semantics, reproduced from order statistics:
    0-based position h = p·(n−1); the values at positions ⌊h⌋ and ⌈h⌉
    come from :func:`grouped_rank` (composite range sort — every task
    handles ~|data|/|partitions| rows regardless of group
    cardinality), and the interpolation uses the TWO-PRODUCT form
    ``v_lo·(⌈h⌉−h) + v_hi·(h−⌊h⌋)`` (integral h short-circuits to
    v_lo) — bit-for-bit the expression BOTH Spark's percentile() and
    DuckDB's quantile_cont() evaluate internally; the one-product
    ``v_lo + (v_hi−v_lo)·frac`` form is 1 ULP off either engine and
    hash-mismatches (measured).

    Ties are immaterial: ranks select by POSITION in the
    (value, tiebreak) total order and the percentile is a function of
    the sorted multiset. ``ps`` maps output column name → p.
    Output: one row per group, one double column per entry of ``ps``.
    """
    reserved = {"_gp_rank", "_p", "_h", "_lo", "_hi", "_n"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"grouped_percentile_exact: rename columns {clash}")
    ranked = grouped_rank(
        df, group_cols, [value_col, tiebreak_col], rank_col="_gp_rank"
    )
    counts = ranked.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    # per (group, p): the one or two ranks needed — |groups|·|ps| rows
    need = (
        counts.select(
            *group_cols,
            "_n",
            F.explode(
                F.array(*[F.lit(float(p)) for p in ps.values()])
            ).alias("_p"),
        )
        .select(
            *group_cols,
            "_p",
            (F.col("_p") * (F.col("_n") - 1)).alias("_h"),  # 0-based
        )
        .select(
            *group_cols,
            "_p",
            "_h",
            F.floor(F.col("_h")).cast("long").alias("_lo"),
            F.ceil(F.col("_h")).cast("long").alias("_hi"),
        )
    )
    # grouped_rank is 1-based; positions are 0-based → rank = pos + 1
    lo = need.select(*group_cols, "_p", "_h", "_lo", "_hi",
                     (F.col("_lo") + 1).alias("_gp_rank"))
    hi = need.where(F.col("_hi") != F.col("_lo")).select(
        *group_cols, "_p", "_h", "_lo", "_hi",
        (F.col("_hi") + 1).alias("_gp_rank")
    )
    wanted = lo.unionAll(hi)
    hit = ranked.join(F.broadcast(wanted), [*group_cols, "_gp_rank"], "inner")
    per_p = hit.groupBy(*group_cols, "_p").agg(
        F.max("_h").alias("_hh"),
        F.max("_lo").alias("_ll"),
        F.max("_hi").alias("_gg"),
        F.max(
            F.when(F.col("_gp_rank") == F.col("_lo") + 1, F.col(value_col))
        ).alias("_vlo"),
        F.max(
            F.when(F.col("_gp_rank") == F.col("_hi") + 1, F.col(value_col))
        ).alias("_vhi"),
    )
    val = F.when(F.col("_gg") == F.col("_ll"), F.col("_vlo")).otherwise(
        F.col("_vlo") * (F.col("_gg") - F.col("_hh"))
        + F.coalesce(F.col("_vhi"), F.col("_vlo"))
        * (F.col("_hh") - F.col("_ll"))
    )
    return per_p.groupBy(*group_cols).agg(
        *[
            F.max(F.when(F.col("_p") == float(p), val)).alias(name)
            for name, p in ps.items()
        ]
    )


def ntile_exact(
    df: DataFrame,
    order_cols: list[str],
    buckets: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact equal-frequency binning (SQL ``NTILE`` semantics: the first
    ``n mod k`` buckets hold one extra row) built on :func:`global_rank`
    — distributed, no single-partition window. The total row count is a
    1-row aggregate joined back by broadcast. Bucket index in pure
    BIGINT ``div`` arithmetic (exact at any rank, unlike
    double-divide+floor)."""
    reserved = {"_grank", "_n"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"ntile_exact: rename columns {clash}")
    ranked = global_rank(df, order_cols, rank_col="_grank")
    total = ranked.agg(F.count(F.lit(1)).alias("_n"))
    joined = ranked.crossJoin(F.broadcast(total))
    bucket = F.expr(
        f"CASE WHEN _n % {buckets} = 0 THEN (_grank - 1) div (_n div {buckets}) "
        f"WHEN _grank - 1 < (_n div {buckets} + 1) * (_n % {buckets}) "
        f"THEN (_grank - 1) div (_n div {buckets} + 1) "
        f"ELSE _n % {buckets} + (_grank - 1 - (_n div {buckets} + 1) * (_n % {buckets})) "
        f"div (_n div {buckets}) END"
    )
    return (
        joined.withColumn(bucket_col, (bucket + 1).cast("long"))
        .drop("_grank", "_n")
    )


def _weighted_cum_frame(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    tiebreak_cols: list[str],
    num_partitions: int | None,
    caller: str,
) -> DataFrame:
    """Shared machinery for the weighted order statistics: composite
    range sort, per-(partition, group) weight cells, broadcast offsets
    — returns the input rows with exact BIGINT ``_cumw`` (cumulative
    weight in (group, value, tiebreak) order) and ``_totw`` (group
    total) attached. See :func:`grouped_weighted_median` for the full
    scale and determinism argument."""
    reserved = {"_pid", "_local_w", "_woff", "_wcell", "_cumw", "_totw"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"{caller}: rename columns {clash}")
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    sort_cols = [F.col(c) for c in [*group_cols, value_col, *tiebreak_cols]]
    sorted_df = df.repartitionByRange(n_part, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    with_pid = sorted_df.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    w_local = (
        Window.partitionBy("_pid", *group_cols)
        .orderBy(*[F.col(value_col)], *[F.col(c) for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = with_pid.withColumn(
        "_local_w", F.sum(weight_col).over(w_local).cast("long")
    )
    cells = with_pid.groupBy("_pid", *group_cols).agg(
        F.sum(weight_col).cast("long").alias("_wcell")
    )
    w_g = Window.partitionBy(*group_cols).orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = cells.select(
        "_pid",
        *group_cols,
        F.coalesce(F.sum("_wcell").over(w_g), F.lit(0)).cast("long").alias("_woff"),
    )
    totals = (
        cells.groupBy(*group_cols)
        .agg(F.sum("_wcell").cast("long").alias("_totw"))
    )
    return (
        local.join(F.broadcast(offsets), ["_pid", *group_cols])
        .withColumn("_cumw", (F.col("_woff") + F.col("_local_w")).cast("long"))
        .join(F.broadcast(totals), group_cols)
    )


def grouped_weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    tiebreak_cols: list[str],
    median_col: str = "weighted_median",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact per-group LOWER WEIGHTED MEDIAN (smallest value v whose
    cumulative weight over rows ordered by value reaches half the
    group's total weight: 2·cumw(v) ≥ totw) without per-group
    single-task sorts — the weighted sibling of
    :func:`grouped_percentile_exact`, for low-cardinality group keys
    over fact-sized input.

    Same two-phase composite range sort as :func:`grouped_rank`
    (groups span partitions, tasks stay ~|data|/|partitions|), but the
    prefix statistic is a WEIGHT sum, which ``monotonically_increasing_
    id`` cannot provide — so the in-partition running weight comes
    from a window partitioned by ``(_pid, group)``: that costs ONE
    extra hash exchange of the stamped fact, and its key cardinality
    is ≥ |partitions| (every partition contributes at least one cell),
    so parallelism never collapses no matter how few groups exist.
    Per-(partition, group) weight-cell offsets broadcast back exactly
    as in grouped_rank. ``weight_col`` must be integral (scaled ints
    per the registry discipline) so cumulative weights are exact and
    the boundary predicate 2·cumw ≥ totw is deterministic; rows with
    equal values share a run whose TOTAL cumulative weight is
    order-independent, so the crossing value is unique even though
    intra-run order is not.

    Returns one row per group: ``group_cols ++ [median_col,
    total_weight]``.
    """
    cum = _weighted_cum_frame(
        df, group_cols, value_col, weight_col, tiebreak_cols, num_partitions,
        caller="grouped_weighted_median",
    )
    return (
        cum.groupBy(*group_cols)
        .agg(
            F.min(
                F.when(2 * F.col("_cumw") >= F.col("_totw"), F.col(value_col))
            ).alias(median_col),
            F.min("_totw").cast("long").alias("total_weight"),
        )
    )


def grouped_weighted_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    tiebreak_cols: list[str],
    quantiles: list[tuple[int, int]],
    prefix: str = "wq",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact per-group lower weighted q-QUANTILES (smallest value
    whose cumulative weight reaches q of the group total:
    den*cumw >= num*totw, each q given as an integer (num, den)
    RATIONAL so the boundary predicate stays exact) — the multi-point
    generalization of :func:`grouped_weighted_median`, sharing its
    two-phase composite-range-sort machinery and its determinism
    argument (equal-value runs have order-independent cumulative
    weight at their boundary). All requested quantiles ride ONE
    cumulative frame and ONE final aggregate — no extra passes per
    quantile. Output: ``group_cols ++ [<prefix>_<num>_<den> ...,
    total_weight]``."""
    cum = _weighted_cum_frame(
        df, group_cols, value_col, weight_col, tiebreak_cols, num_partitions,
        caller="grouped_weighted_quantiles",
    )
    aggs = [
        F.min(
            F.when(
                den * F.col("_cumw") >= num * F.col("_totw"), F.col(value_col)
            )
        ).alias(f"{prefix}_{num}_{den}")
        for num, den in quantiles
    ]
    return cum.groupBy(*group_cols).agg(
        *aggs, F.min("_totw").cast("long").alias("total_weight")
    )
