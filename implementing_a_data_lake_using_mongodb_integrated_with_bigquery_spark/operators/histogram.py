"""Equi-depth histograms and selectivity estimation (CBO statistics).

The optimizer-statistics companion to the sketch family: an
equi-depth (equi-height) histogram over an integer column, plus the
classic range-predicate selectivity estimate computed FROM the
histogram and audited against the exact answer. This is the exact
structure ANALYZE builds in warehouse CBOs (Spark's own
``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` builds equi-depth
histograms the same way); surfacing it as a query makes the
estimation error measurable instead of assumed.

Determinism: bucket assignment is NTILE semantics over the total
order ``(value, tiebreak)``, so bucket boundaries, counts, and the
interpolation inputs are identical integers on both engines; the only
float is the final interpolated estimate, rounded to 6dp.

Scale shape: the bucket cut runs through
``operators.windows.ntile_exact`` — a distributed range sort plus a
broadcast |partitions|-row offset table, never an unpartitioned
``ntile().over(...)`` (which serializes the fact table into one
task). The estimation arithmetic downstream is histogram-sized
(``n_buckets`` rows), and the true-count audit is one conditional
aggregate pass over the column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import ntile_exact


def equidepth_histogram(
    df: DataFrame,
    val_col: str,
    tiebreak_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Equi-depth histogram: ``(bucket, lo, hi, cnt)`` with buckets
    numbered 1..n_buckets by exact NTILE semantics over
    ``(val, tiebreak)`` via the distributed :func:`ntile_exact`.
    Integer values keep lo/hi/cnt exact."""
    binned = ntile_exact(
        df.select(F.col(val_col).alias("_v"), F.col(tiebreak_col).alias("_tb")),
        ["_v", "_tb"],
        n_buckets,
        bucket_col="bucket",
    )
    return (
        binned.groupBy("bucket")
        .agg(
            F.min("_v").alias("lo"),
            F.max("_v").alias("hi"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )


def selectivity_audit(
    df: DataFrame,
    val_col: str,
    tiebreak_col: str,
    literals: list[int],
    n_buckets: int = 32,
) -> DataFrame:
    """Histogram-estimated vs exact row counts for the predicates
    ``val > X`` over each literal.

    Per bucket the estimator assumes uniform spread: a bucket
    entirely above X contributes its full count, entirely at-or-below
    contributes 0, a straddling bucket contributes
    ``cnt * (hi - X) / (hi - lo)``. The straddle fraction is computed
    as the INTEGER ``((hi - X) * 1e6) div (hi - lo)`` so the
    per-threshold sum is a BIGINT — a float sum over buckets would be
    accumulation-order-dependent and flake the value-hash oracle; the
    single trailing division by 1e6 is the only float. Emits
    ``(threshold, est_rows 6dp, true_rows, rel_error 6dp)``.

    The literals table is ``len(literals)`` rows and the histogram
    ``n_buckets`` rows, so the estimate is a broadcast
    nested-product over two tiny tables; the exact side is ONE
    conditional-aggregate scan computing every literal's true count
    simultaneously (no per-literal rescans).
    """
    hist = equidepth_histogram(df, val_col, tiebreak_col, n_buckets)
    spark = df.sparkSession
    lits = spark.createDataFrame(
        [(int(x),) for x in sorted(literals)], "threshold bigint"
    )
    contrib = (
        F.when(F.col("lo") > F.col("threshold"), F.col("cnt") * F.lit(1_000_000))
        .when(F.col("hi") <= F.col("threshold"), F.lit(0).cast("long"))
        .otherwise(
            F.col("cnt")
            * F.expr("((hi - threshold) * 1000000) div (hi - lo)")
        )
    )
    est = (
        hist.crossJoin(F.broadcast(lits))
        .groupBy("threshold")
        .agg(
            F.round(
                F.sum(contrib).cast("long") / F.lit(1_000_000).cast("double"), 6
            ).alias("est_rows")
        )
    )
    true_aggs = df.agg(
        *[
            F.sum(
                F.when(F.col(val_col) > F.lit(int(x)), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(f"_t{i}")
            for i, x in enumerate(sorted(literals))
        ]
    )
    truth = true_aggs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(x)).cast("long").alias("threshold"),
                        F.col(f"_t{i}").alias("true_rows"),
                    )
                    for i, x in enumerate(sorted(literals))
                ]
            )
        ).alias("s")
    ).select("s.threshold", "s.true_rows")
    return est.join(F.broadcast(truth), "threshold").select(
        "threshold",
        "est_rows",
        "true_rows",
        F.round(
            (F.col("est_rows") - F.col("true_rows"))
            / F.col("true_rows").cast("double"),
            6,
        ).alias("rel_error"),
    )
