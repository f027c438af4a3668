"""User-defined execution surface beyond pandas UDFs: ``mapInArrow``
and Python UDTFs (SURVEY §2.9 extension).

Completes the engine's Python-API matrix — scalar pandas UDF
(``functions.hashing``), grouped map (``grouped_pct_rank``), cogrouped
map (``operators.asof``), ``mapInPandas`` (``operators.multimodal``),
``applyInPandasWithState`` (``streaming.stateful``) — with the two
remaining shapes:

- ``mapInArrow``: zero-copy Arrow RecordBatch in/out. For fixed-width
  vector math this is the fastest Python path — numpy operates
  directly on the Arrow buffers (no pandas materialization, no
  per-row Python). Still a worker round-trip: prefer built-in
  higher-order functions (see ``registry.q_array_functions``) when
  they can express the computation; reach for this when you need BLAS.
- Python UDTF: SQL ``LATERAL``-joinable table functions. Row-at-a-time
  by construction — the demo keeps it OFF the hot path (per-document
  n-gram expansion, bounded by corpus size, Arrow-batched transfer).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vector_norms_arrow(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-row L2 norm and component sum of a vector column via
    ``mapInArrow`` + numpy-on-Arrow-buffers (vectorized across the
    whole batch; ragged rows handled through the list offsets).
    Results rounded to 6dp per the determinism convention."""
    import numpy as np
    import pyarrow as pa

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ids = batch.column(batch.schema.get_field_index(id_col))
            col = batch.column(batch.schema.get_field_index(vec_col))
            if isinstance(col, pa.ChunkedArray):  # pragma: no cover
                col = col.combine_chunks()
            # flat values + offsets: one vectorized pass, no per-row loop
            values = col.values.to_numpy(zero_copy_only=False).astype("float64")
            offsets = col.offsets.to_numpy(zero_copy_only=False).astype("int64")
            # reduceat needs non-empty segments; empty rows patched to 0
            starts = offsets[:-1]
            lengths = offsets[1:] - starts
            safe_starts = np.minimum(starts, max(len(values) - 1, 0))
            sq = np.add.reduceat(values * values, safe_starts) if len(values) else np.zeros(len(starts))
            sm = np.add.reduceat(values, safe_starts) if len(values) else np.zeros(len(starts))
            sq = np.where(lengths > 0, sq, 0.0)
            sm = np.where(lengths > 0, sm, 0.0)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(np.round(np.sqrt(sq), 6), type=pa.float64()),
                    pa.array(np.round(sm, 6), type=pa.float64()),
                ],
                names=[id_col, "l2_norm", "component_sum"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        batches, f"{id_col} long, l2_norm double, component_sum double"
    )


def ngram_udtf_class():
    """Return the n-gram Python UDTF class (lazily built so importing
    this module never requires a SparkSession). Register with
    ``spark.udtf.register('ngrams', ngram_udtf_class())`` and use in
    SQL as ``..., LATERAL ngrams(text, 3) t``."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string")
    class NGrams:
        def eval(self, text: str, n: int):  # noqa: D102
            if text is None or n is None or n <= 0:
                return
            toks = text.split(" ")
            for i in range(len(toks) - n + 1):
                yield i, " ".join(toks[i : i + n])

    return NGrams


def udtf_ngram_counts(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Corpus n-gram counts through the UDTF lateral-join path:
    (ngram, n_occurrences). The UDTF expands per-document (bounded
    fan-out); the count is the usual two-phase aggregate."""
    spark = docs.sparkSession
    spark.udtf.register("lakeflow_ngrams", ngram_udtf_class())
    docs.select(text_col).createOrReplaceTempView("_udtf_ngram_src")
    return spark.sql(
        f"""
        SELECT t.ngram, count(*) AS n_occurrences
        FROM _udtf_ngram_src d, LATERAL lakeflow_ngrams(d.{text_col}, {int(n)}) t
        GROUP BY t.ngram
        """
    )


def grouped_median_udaf(
    df: DataFrame, group_col: str, val_col: str
) -> DataFrame:
    """Custom aggregate through the GROUPED_AGG pandas-UDF path — the
    Spark surface for UDAFs Python-side: each group's values arrive as
    ONE pandas Series (Arrow-batched) and reduce to a scalar. Exact
    median here: numpy sorts, so the result is a pure function of the
    group's value multiset — partition-order-independent, unlike a
    float sum, which is what makes a Python UDAF oracle-safe at all.

    Scale shape: one shuffle on the group key; groups must fit in
    executor memory (the GROUPED_AGG contract — use the built-in
    ``percentile_approx`` when they don't). Deliberately off hot
    paths; the built-in median/approx_percentile is the default.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _median_fn(v):
        return float(np.median(v.to_numpy()))

    # the Series->scalar signature is what selects the GROUPED_AGG
    # variant; this module's `from __future__ import annotations`
    # would stringify inline hints, so attach real types at runtime
    _median_fn.__annotations__ = {"v": pd.Series, "return": float}
    _median = pandas_udf(_median_fn, "double")

    def _count_fn(v):
        return len(v)

    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM
    # aggregates in one agg, so the row count rides the pandas path too
    _count_fn.__annotations__ = {"v": pd.Series, "return": int}
    _count = pandas_udf(_count_fn, "long")

    return df.groupBy(group_col).agg(
        F.round(_median(F.col(val_col)), 6).alias("median_value"),
        _count(F.col(val_col)).alias("n"),
    )
