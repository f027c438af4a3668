"""Distributed exact linear algebra over embedding columns.

The first step of every classical dimension-reduction / whitening
pipeline (PCA, ZCA, Fisher LDA) over a corpus of embeddings is a
moment computation: Gram matrix / covariance (global) and per-class
scatter (grouped). At 100 TB these are the textbook map-reduce
shapes — each partition reduces its rows to a tiny fixed-size partial
(d×d int64 for the Gram, d-vector for the sums), and one shuffle of
|partitions| × O(d²) rows produces the exact global moments. No
driver-side data, no N×N anything.

Determinism contract (registry.py conventions): vectors are scaled to
integers first (``floor(x·10⁴)`` after a float64 cast — floor is
tie-free and identical across engines, and the float64 cast matters:
float32 × 10⁴ can land on the other side of an integer boundary than
float64 ×), and every emitted moment is an int64 sum of int64 terms —
associative, so identical under ANY partitioning, on Spark and DuckDB
alike. The covariance numerator ``n·Σxy − Σx·Σy`` stays in int64: with
scale s and |x| ≤ B this needs ``n² · (sB²s²)…`` — concretely it is
exact while ``n · max|Σxy| < 2⁶³`` (n ≲ 10⁷ rows at s=10⁴, |x| ≤ 10).
Beyond that, switch the final combine to the two-pass centered form
(subtract the broadcast integer means, then one more partial-sum
pass) — the partial-aggregation shape is unchanged.

Python-API surface: the global Gram uses ``mapInArrow`` (zero-copy
numpy-on-Arrow int64 matmul per batch, emit ONE partial per
partition); the per-class scatter uses ``applyInArrow`` (grouped
Arrow table in/out) — the one grouped-Arrow shape the UDF matrix
(operators/udx.py docstring) did not yet exercise.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 10_000


def _quantized_matrix(vec_chunked, dim: int):
    """Stack an Arrow list<float> column into an (n, dim) int64 matrix
    of floor(x·SCALE) values; raises if any row deviates from dim."""
    import numpy as np
    import pyarrow as pa

    arr = (
        vec_chunked.combine_chunks()
        if isinstance(vec_chunked, pa.ChunkedArray)
        else vec_chunked
    )
    offsets = arr.offsets.to_numpy()
    widths = offsets[1:] - offsets[:-1]
    if len(widths) and not (widths == dim).all():
        bad = int(widths[widths != dim][0])
        raise ValueError(f"expected embedding dim {dim}, found a row with {bad}")
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return np.floor(flat * _SCALE).astype(np.int64).reshape(-1, dim)


def covariance_pairs(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Exact integer co-moment table over a vector column: one row per
    unordered dimension pair (i ≤ j) with the global n, Σxᵢ, Σxⱼ and
    Σxᵢxⱼ of the floor(x·10⁴)-scaled values.

    Plan shape: mapInArrow reduces each partition to d(d+1)/2 partial
    rows (int64 Gram matmul per Arrow batch, accumulated across the
    partition, emitted once at partition end), then ONE hash
    aggregation over |partitions| × d(d+1)/2 rows combines the
    partials. The raw vectors never shuffle.
    """
    import numpy as np
    import pyarrow as pa

    iu, ju = np.triu_indices(dim)
    iu32, ju32 = iu.astype(np.int32), ju.astype(np.int32)

    def partials(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        gram = np.zeros((dim, dim), dtype=np.int64)
        sums = np.zeros(dim, dtype=np.int64)
        n = 0
        for batch in batches:
            x = _quantized_matrix(batch.column(0), dim)
            gram += x.T @ x
            sums += x.sum(axis=0)
            n += x.shape[0]
        if n:
            yield pa.RecordBatch.from_pydict(
                {
                    "i": iu32,
                    "j": ju32,
                    "n_part": np.full(len(iu), n, dtype=np.int64),
                    "sx_part": sums[iu],
                    "sy_part": sums[ju],
                    "sxy_part": gram[iu, ju],
                }
            )

    part = df.select(vec_col).mapInArrow(
        partials,
        "i int, j int, n_part long, sx_part long, sy_part long, sxy_part long",
    )
    return part.groupBy("i", "j").agg(
        F.sum("n_part").alias("n_rows"),
        F.sum("sx_part").alias("sx"),
        F.sum("sy_part").alias("sy"),
        F.sum("sxy_part").alias("sxy"),
    )


def top_covariant_pairs(df: DataFrame, vec_col: str, dim: int, k: int) -> DataFrame:
    """Top-k most-covariant off-diagonal dimension pairs, ranked by
    |n·Σxy − Σx·Σy| (the exact int64 covariance numerator) with a
    (i, j) total-order tiebreak. The ranking input is d(d-1)/2 rows —
    a TakeOrdered, no global sort materialization."""
    co = covariance_pairs(df, vec_col, dim).where(F.col("i") < F.col("j"))
    cov_num = (
        F.col("n_rows") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).alias("cov_num")
    return (
        co.select(
            F.col("i").alias("dim_i"),
            F.col("j").alias("dim_j"),
            F.col("n_rows"),
            cov_num,
        )
        .orderBy(F.abs(F.col("cov_num")).desc(), "dim_i", "dim_j")
        .limit(k)
    )


def grouped_moments(
    df: DataFrame, group_col: str, vec_col: str, dim: int
) -> DataFrame:
    """Per-group per-dimension exact first/second moments (n, Σx, Σx²)
    of the floor(x·10⁴)-scaled vector column — the within-class
    scatter diagonal of Fisher-discriminant / per-label whitening
    prep, via ``applyInArrow`` (grouped Arrow table in/out).

    One shuffle on the group key; each group reduces to d rows of
    int64 sums inside the Arrow worker (no pandas materialization).
    Assumes per-group rows fit a worker, which holds when groups are
    class labels; for heavy-hitter groups, pre-reduce with the
    mapInArrow partial shape of :func:`covariance_pairs` instead.
    """
    import numpy as np
    import pyarrow as pa

    def moments(table: pa.Table) -> pa.Table:
        x = _quantized_matrix(table.column(vec_col), dim)
        key = table.column(group_col)[0].as_py()
        return pa.table(
            {
                group_col: pa.array([key] * dim, type=table.schema.field(group_col).type),
                "dim": np.arange(dim, dtype=np.int32),
                "n_vecs": np.full(dim, x.shape[0], dtype=np.int64),
                "sx": x.sum(axis=0),
                "sxx": (x * x).sum(axis=0),
            }
        )

    out_schema = (
        f"{group_col} {df.schema[group_col].dataType.simpleString()}, "
        "dim int, n_vecs long, sx long, sxx long"
    )
    return (
        df.select(group_col, vec_col)
        .groupBy(group_col)
        .applyInArrow(moments, out_schema)
    )
