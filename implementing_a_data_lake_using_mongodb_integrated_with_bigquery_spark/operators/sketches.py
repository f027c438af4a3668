"""Count-min sketch: mergeable frequency counters over a keyed count
table.

The sketch is a ``depth × width`` grid of integer counters; row ``j``
buckets a key through an independent seeded hash. Point estimate =
min over rows of the addressed counter (always an OVERestimate — every
collision only adds). Counters are plain integer SUMs, so the sketch
is **order-independent and exactly mergeable**: sketch(A ⊎ B) =
sketch(A) + sketch(B) cell-for-cell, the property that makes it the
standard distributed/streaming heavy-hitter structure (Cormode &
Muthukrishnan 2005).

Engine-exact hashing (CLAUDE.md convention): the bucket hash must be
reproducible bit-for-bit on Spark AND DuckDB, so it is defined ONCE
here as a pair of builders over the same formula — the first 4 hex
chars of ``md5("cms<seed>:" || key)`` parsed as an integer, mod width:

- Spark:  ``conv(substr(md5(...), 1, 4), 16, 10)`` cast to long;
- DuckDB: ``('0x' || substr(md5(...), 1, 4))::BIGINT``.

Both parse the same 4 hex chars of the same md5, so the bucket ids are
identical by construction (pinned in tests/test_sketches.py). All
arithmetic stays in BIGINT — no floats anywhere in the sketch.

Scale: building the sketch from a (key, cnt) table is one explode of
``depth`` rows per DISTINCT key + one ``depth×width``-row hash
aggregate — the corpus itself is touched only by the upstream count.
At 100 TB the sketch stays ``depth×width`` rows regardless of corpus
size; merging shards is a cell-wise integer sum.

Reference parity: the reference has no sketch surface (its analytics
stop at exact COUNT audits, e.g. src/monitor.sh:12-24); this module is
part of the training-data-pipeline extension mandated by the north
star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_bucket_col",
    "cms_bucket_sql",
    "cms_build",
    "cms_estimate",
    "cms_inner_product",
]


def _salt(seed: int) -> str:
    return f"cms{seed}:"


def cms_bucket_col(key: Column, seed: int, width: int) -> Column:
    """Spark side of the engine-exact bucket hash (BIGINT in
    [0, width))."""
    h = F.md5(F.concat(F.lit(_salt(seed)), key))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % width).alias(
        f"b{seed}"
    )


def cms_bucket_sql(key_expr: str, seed: int, width: int) -> str:
    """DuckDB side of the SAME bucket hash — generated from the same
    salt/width so the two engines cannot drift."""
    return (
        f"(('0x' || substr(md5('{_salt(seed)}' || {key_expr}), 1, 4))::BIGINT"
        f" % {width})"
    )


def cms_build(
    counts: DataFrame,
    key_col: str = "token",
    cnt_col: str = "cnt",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch of a (key, cnt) table → (seed, bucket, counter)
    with exactly depth×width candidate cells (empty cells absent).

    One ``depth``-way explode over the distinct-key table + one
    (seed, bucket) integer-sum aggregate; the grid is tiny and
    broadcastable downstream.
    """
    k = F.col(key_col)
    cells = counts.select(
        F.col(cnt_col).alias("_c"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("seed"),
                        cms_bucket_col(k, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_cell"),
    )
    return cells.groupBy(
        F.col("_cell.seed").alias("seed"), F.col("_cell.bucket").alias("bucket")
    ).agg(F.sum("_c").cast("long").alias("counter"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "token",
    depth: int = 4,
    width: int = 256,
    est_col: str = "n_est",
) -> DataFrame:
    """Point-estimate each probe key against the sketch: address one
    cell per seed, estimate = min over seeds. The sketch (≤ depth×width
    rows) is broadcast — the probe table never shuffles."""
    k = F.col(key_col)
    addressed = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("seed"),
                        cms_bucket_col(k, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_cell"),
    ).select("*", F.col("_cell.seed").alias("seed"), F.col("_cell.bucket").alias("bucket")).drop("_cell")
    joined = addressed.join(F.broadcast(sketch), ["seed", "bucket"], "left")
    others = [c for c in probes.columns]
    return joined.groupBy(*others).agg(
        F.min(F.coalesce(F.col("counter"), F.lit(0))).cast("long").alias(est_col)
    )


def cms_inner_product(sk_a: DataFrame, sk_b: DataFrame) -> DataFrame:
    """Join-size estimate from two sketches over the SAME (depth,
    width, salt) configuration: per seed, the inner product of the two
    counter rows; the estimate is the MIN over seeds (Cormode &
    Muthukrishnan 2005 §4.2 — every row's inner product equals the
    true equi-join size plus non-negative collision mass, so min is
    the tightest and still never underestimates). Returns one row
    (est_size DECIMAL(38,0) — r11 int64-overflow sweep: the estimate
    carries collision mass ~N_a·N_b/width, which exceeds int64 long
    before the TRUE join size does at 100 TB, and a counter product of
    two ~5e8 cell counts already overflows int64 per term — an ANSI
    ArithmeticException at scale). Pure integer arithmetic on two
    grid-sized inputs — the 100 TB join never runs to be sized."""
    j = sk_a.alias("a").join(
        sk_b.alias("b"), ["seed", "bucket"]
    )  # absent cells are 0 ⇒ contribute nothing: inner join suffices
    per_seed = j.groupBy("seed").agg(
        F.sum(
            F.col("a.counter").cast("decimal(38,0)")
            * F.col("b.counter").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("ip")
    )
    return per_seed.agg(F.min("ip").cast("decimal(38,0)").alias("est_size"))
