"""Physical layout management: partitioned and bucketed tables.

The reference's only layout discipline is hourly time-bucketing of
ingests (``src/ingest_weather_data.py:142``). At 100 TB, layout IS the
query plan:

- **Partitioned writes** (``partitionBy``): coarse pruning columns
  (date/hour, source, lang). A filter on the partition column prunes
  whole directories before any IO (``PartitionFilters`` in the scan).
- **Bucketed tables** (``bucketBy`` + ``saveAsTable``): pre-shuffled
  layout on the join/agg key. Two tables bucketed the same way join
  with ZERO exchanges — the shuffle is paid once at write time and
  amortized over every subsequent join. This is the engine's answer to
  the reference's "external state as join side" pattern: keep the fact
  and its key snapshot co-bucketed and the CDC merge's anti-join never
  reshuffles the target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet (hive-style) for partition
    pruning on the listed columns."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins/aggs on ``bucket_col`` between tables with identical
    bucketing run shuffle-free."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def write_json_projection(df: DataFrame, path: str, single_file: bool = True) -> None:
    """K5: JSON projection export (reference
    ``src/extract_coordinates.py:21-25`` dumps one coordinates JSON
    file for downstream lookup). ``coalesce(1)`` funnels the write
    through ONE task — correct for a small projected lookup artifact,
    deliberately NOT for bulk egress (use ``write_partitioned``);
    pass ``single_file=False`` to keep the input parallelism."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def zorder_key(x: Column | str, y: Column | str, bits: int = 10) -> Column:
    """Morton (Z-order) interleave of two pre-quantized non-negative
    integer columns — the multi-dimensional clustering key behind
    data-skipping layouts (Delta/Iceberg OPTIMIZE ZORDER): sorting by
    the interleaved key keeps rows close in BOTH dimensions close in
    file order, so per-file min/max stats prune scans on either
    predicate column, not just the leading sort column.

    Callers quantize first (the key is only as good as the histogram);
    inputs are masked to ``bits`` bits. Pure shift/or expressions —
    whole-stage codegen, engine-portable arithmetic.
    """
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    mask = (1 << bits) - 1
    xm, ym = xc.bitwiseAND(F.lit(mask)), yc.bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        key = key + F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i)
    return key


def zorder_oracle_sql(x_expr: str, y_expr: str, bits: int = 10) -> str:
    """The DuckDB arithmetic twin of :func:`zorder_key` (for oracles):
    a sum of masked shift terms over the same ``bits`` bit positions."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) & {mask}) >> {i}) & 1) * {1 << (2 * i + 1)}")
        terms.append(f"(((({y_expr}) & {mask}) >> {i}) & 1) * {1 << (2 * i)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


# ------------------------------------------------------------------
# Deterministic shuffle-shard writer: the training-data materialization
# step. A training run wants the corpus as N equal-ish shards whose
# membership AND intra-shard order are pure functions of row content —
# stable across reruns, cluster layouts, and engines — so data loaders
# can seek/resume by (shard, offset) and two pipelines produce
# byte-identical shards. Assignment: 16 bits of md5(salt||key) mod N
# (16 bits parse identically on every engine — no 64-bit hex-overflow
# disagreement); order: the full md5 hex, compared lexicographically
# (engine-portable shuffle, same trick as sampling.split_column).
# ------------------------------------------------------------------

def shard_hash(key: Column | str, salt: str = "v1") -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(salt), F.lit("\x1f"), c.cast("string")))


def shard_column(key: Column | str, num_shards: int, salt: str = "v1") -> Column:
    """Deterministic shard id in [0, num_shards): first 4 hex chars of
    the salted md5, parsed as a 16-bit int, mod N."""
    h16 = F.conv(F.substring(shard_hash(key, salt), 1, 4), 16, 10).cast("long")
    return F.pmod(h16, F.lit(num_shards)).cast("int")


def shard_sql(key_sql: str, num_shards: int, salt: str = "v1") -> tuple[str, str]:
    """(shard_id_expr, order_hash_expr) for DuckDB — generated beside
    the Spark expressions so engine and oracle can't drift."""
    h = f"md5('{salt}' || chr(31) || CAST({key_sql} AS VARCHAR))"
    shard = f"CAST(('0x' || substr({h}, 1, 4))::INTEGER % {num_shards} AS INTEGER)"
    return shard, h


def shard_assignment(
    df: DataFrame, key_col: str, num_shards: int, salt: str = "v1"
) -> DataFrame:
    """Tag every row with (shard_id, order_hash)."""
    return df.withColumn(
        "shard_id", shard_column(F.col(key_col), num_shards, salt)
    ).withColumn("order_hash", shard_hash(F.col(key_col), salt))


def write_sharded(
    df: DataFrame,
    path: str,
    key_col: str,
    num_shards: int = 64,
    salt: str = "v1",
) -> None:
    """Materialize deterministic shards: hive-partition directories
    shard_id=K, rows inside each shard in order_hash order.

    ONE shuffle (repartition on shard_id) + a partition-local sort;
    ``partitionBy`` then writes each shard directory from the single
    task that owns it, so every shard is one sorted file regardless of
    upstream partitioning. Shard count scales the write parallelism —
    at 100 TB pick num_shards >= cluster cores and shards stay
    task-sized."""
    tagged = shard_assignment(df, key_col, num_shards, salt)
    (
        tagged.repartition(num_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "order_hash")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def with_hilbert_key(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 6,
    out_col: str = "hkey",
) -> DataFrame:
    """Hilbert-curve clustering key over two pre-quantized non-negative
    integer columns — the locality-tighter alternative to
    :func:`zorder_key`: the Hilbert curve never takes the long
    diagonal jumps Morton order does, so consecutive key ranges map to
    tighter 2-D tiles and per-file min/max stats prune better on both
    predicate columns (why newer table formats offer OPTIMIZE ... BY
    HILBERT beside ZORDER).

    Standard xy→d walk, one projection per level over NAMED columns
    (``withColumn`` chain, not a nested expression — the rotation
    state references each prior column ~3×, so inlining would grow the
    tree 3^bits). All shift/xor/subtract integer arithmetic:
    whole-stage codegen, engine-portable, exactly mirrored by
    :func:`hilbert_oracle_sql`.
    """
    mask = (1 << bits) - 1
    df = (
        df.withColumn("_hx", x.cast("long").bitwiseAND(F.lit(mask)))
        .withColumn("_hy", y.cast("long").bitwiseAND(F.lit(mask)))
        .withColumn(out_col, F.lit(0).cast("long"))
    )
    for i in reversed(range(bits)):
        s = 1 << i
        rx = (
            F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        ry = (
            F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        df = df.withColumn(
            out_col, F.col(out_col) + F.lit(s * s) * (rx * 3).bitwiseXOR(ry)
        )
        # rotate the frame: ry==0 → (reflect if rx==1, then swap axes)
        nx = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - F.col("_hy")).otherwise(F.col("_hy")),
        ).otherwise(F.col("_hx"))
        ny = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - F.col("_hx")).otherwise(F.col("_hx")),
        ).otherwise(F.col("_hy"))
        df = (
            df.withColumn("_nhx", nx)
            .withColumn("_nhy", ny)
            .drop("_hx", "_hy")
            .withColumnRenamed("_nhx", "_hx")
            .withColumnRenamed("_nhy", "_hy")
        )
    return df.drop("_hx", "_hy")


def hilbert_oracle_sql(
    from_sql: str, keep_cols: str, x_expr: str, y_expr: str, bits: int = 6,
    out_col: str = "hkey",
) -> str:
    """DuckDB twin of :func:`with_hilbert_key`: one nested subquery per
    level carrying the (hx, hy, hd) walk state as named columns."""
    mask = (1 << bits) - 1
    q = (
        f"SELECT {keep_cols}, CAST(({x_expr}) & {mask} AS BIGINT) AS hx, "
        f"CAST(({y_expr}) & {mask} AS BIGINT) AS hy, "
        f"CAST(0 AS BIGINT) AS hd FROM {from_sql}"
    )
    for i in reversed(range(bits)):
        s = 1 << i
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        q = (
            f"SELECT {keep_cols}, "
            f"hd + {s * s} * CAST(xor(3 * {rx}, {ry}) AS BIGINT) AS hd, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END) ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END) ELSE hy END AS hy "
            f"FROM ({q})"
        )
    return f"SELECT {keep_cols}, hd AS {out_col} FROM ({q})"


def rendezvous_shard(key: Column, n: int, salt: str = "v1") -> Column:
    """Highest-random-weight (rendezvous) shard assignment: shard s
    wins the key iff ``md5('<salt>|<s>|' || key)`` is the
    lexicographic maximum over all shards (first-max tiebreak —
    smallest winning index, same CASE-chain rule the PQ argmin uses).

    The property that matters at fleet scale: growing the shard set
    from n to n+1 moves EXACTLY the keys the new shard wins (an
    expected 1/(n+1) of them) and nothing else — no ring segments to
    rebalance, no modulo reshuffle of the whole corpus. Hex-text
    comparison is the engine-portable ``operators.sampling`` trick; n
    hashes per row, map-only, codegen'd.
    """
    hs = [
        F.md5(F.concat(F.lit(f"{salt}|{s}|"), key.cast("string")))
        for s in range(n)
    ]
    expr = None
    for s in range(n - 1):
        cond = None
        for t in range(s + 1, n):
            c = hs[s] >= hs[t]
            cond = c if cond is None else (cond & c)
        expr = (
            F.when(cond, F.lit(s)) if expr is None else expr.when(cond, F.lit(s))
        )
    return expr.otherwise(F.lit(n - 1)).cast("long")


def rendezvous_oracle_sql(key_expr: str, n: int, salt: str = "v1") -> str:
    """DuckDB twin of :func:`rendezvous_shard` (first-max CASE chain
    over the same md5 hex strings)."""
    def h(s: int) -> str:
        return f"md5('{salt}|{s}|' || CAST({key_expr} AS VARCHAR))"

    whens = []
    for s in range(n - 1):
        cond = " AND ".join(f"{h(s)} >= {h(t)}" for t in range(s + 1, n))
        whens.append(f"WHEN {cond} THEN {s}")
    return f"CAST(CASE {' '.join(whens)} ELSE {n - 1} END AS BIGINT)"
