"""Skew-resistant join: key salting.

AQE's skew-join splitting handles most hot keys at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in our session), but
salting is the deterministic-plan fallback when a handful of keys
dominate (a viral user_id, a null-heavy FK): the fact side scatters
each hot key across ``salt_buckets`` sub-keys, the dim side replicates
each row ``salt_buckets`` times, and the join key becomes
(key, salt) — hot partitions shrink by the bucket factor at the cost
of |dim|·buckets replication. Results are identical to the unsalted
join for any 1:N equi-join (each fact row still meets exactly its
matching dim rows, once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on ``on`` with the fact side salted.

    ``dim`` must be unique per key (1:N join) — each dim row is
    replicated per salt bucket, so a many:many join would duplicate.
    """
    fact_s = fact.withColumn(
        "_salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))).cast("int")
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return fact_s.join(dim_s, on=[on, "_salt"], how=how).drop("_salt")


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 5,
) -> DataFrame:
    """Join-key skew diagnosis: the numbers you look at BEFORE picking
    a salting factor or trusting AQE's skew split. One row per metric:
    the Gini coefficient of the key-frequency distribution, the
    p99/p50 frequency ratio, the share of rows held by the top key,
    and the top-``top_n`` hottest keys (one row each).

    All inputs are exact integers: frequencies come from one hash
    aggregate; Gini uses the sorted-prefix identity
    ``G = (2·Σ i·x_i) / (n·Σ x) − (n+1)/n`` over ranked frequencies
    (rank, products, and both sums are BIGINTs; the two divisions are
    the only floats, 6dp). Output: ``(metric, key, value)`` — ``key``
    is null for scalar metrics.

    Scale shape: the frequency table is |distinct keys| rows; the rank
    window over it is a single sort of that (already reduced) table —
    at 100 TB the raw table never moves, only its key histogram.
    """
    from pyspark.sql import Window

    freq = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    w = Window.orderBy(F.col("x").asc(), F.col("k").asc())
    ranked = freq.select(
        "k", "x", F.row_number().over(w).cast("long").alias("i")
    )
    # Σ i·x in DECIMAL(38,0) with cast-before-multiply, and the n·tot
    # denominator formed in DOUBLE (r11 int64-overflow sweep: rank i ~
    # |keys| times count x ~ rows/key overflows a LONG per term at
    # 100 TB, and n·tot as an integer product overflows before its
    # cast — ANSI raises at scale)
    scalars = ranked.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("x").alias("_tot"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)"))
        .alias("_iwx"),
        F.max("x").alias("_max"),
    ).select(
        F.round(
            (2.0 * F.col("_iwx").cast("double"))
            / (F.col("_n").cast("double") * F.col("_tot").cast("double"))
            - (F.col("_n") + 1) / F.col("_n").cast("double"),
            6,
        ).alias("gini"),
        F.round(F.col("_max") / F.col("_tot").cast("double"), 6).alias(
            "top_key_share"
        ),
        F.col("_n").alias("n_keys"),
        F.col("_tot").alias("n_rows"),
    )
    quantiles = ranked.crossJoin(F.broadcast(scalars.select("n_keys"))).select(
        "x",
        F.when(F.col("i") == F.ceil(F.col("n_keys") * 0.5).cast("long"), "p50")
        .when(F.col("i") == F.ceil(F.col("n_keys") * 0.99).cast("long"), "p99")
        .alias("q"),
    ).where(F.col("q").isNotNull())
    p = quantiles.groupBy().pivot("q", ["p50", "p99"]).agg(F.max("x"))
    header = scalars.crossJoin(F.broadcast(p)).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("gini").alias("metric"),
                    F.lit(None).cast("long").alias("key"),
                    F.col("gini").alias("value"),
                ),
                F.struct(
                    F.lit("top_key_share").alias("metric"),
                    F.lit(None).cast("long").alias("key"),
                    F.col("top_key_share").alias("value"),
                ),
                F.struct(
                    F.lit("p99_p50_ratio").alias("metric"),
                    F.lit(None).cast("long").alias("key"),
                    F.round(F.col("p99") / F.col("p50").cast("double"), 6).alias(
                        "value"
                    ),
                ),
                F.struct(
                    F.lit("n_keys").alias("metric"),
                    F.lit(None).cast("long").alias("key"),
                    F.col("n_keys").cast("double").alias("value"),
                ),
            )
        ).alias("s")
    ).select("s.metric", "s.key", "s.value")
    hot = (
        ranked.crossJoin(F.broadcast(scalars.select("n_keys")))
        .where(F.col("i") > F.col("n_keys") - top_n)
        .select(
            F.lit("hot_key_rows").alias("metric"),
            F.col("k").cast("long").alias("key"),
            F.col("x").cast("double").alias("value"),
        )
    )
    return header.unionAll(hot)
