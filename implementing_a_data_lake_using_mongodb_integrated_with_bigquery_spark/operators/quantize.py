"""Embedding quantization audit — int8 storage-path validation.

At 100 TB the embedding column dominates storage and ANN shuffle
width; the standard mitigation is symmetric int8 quantization
(per-vector scale = max|x|/127). Before switching the index to
quantized vectors, a pipeline must audit what the compression does to
geometry. This operator reports, per vector, the reconstruction
cosine and the worst per-dimension absolute error — the two numbers
that bound ANN recall loss.

Scale shape: map-only. Every metric is a higher-order-function
expression over the vector (JVM codegen, no Python, no shuffle);
max-based error metrics are chosen over mean-squared ones because max
is accumulation-order-free, keeping the audit oracle-checkable
bit-for-bit (the cosine fold's left-to-right parity with DuckDB is
established by ``functions/vector.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.functions.vector import (
    cosine_similarity,
)


def quantize_audit(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """(id, scale, cos_recon, max_abs_err) per vector under symmetric
    ``bits``-bit quantization. All-zero vectors (scale 0) are dropped —
    they quantize to themselves and would otherwise divide by zero."""
    qmax = float(2 ** (bits - 1) - 1)
    e = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(e, lambda x: F.abs(x))) / qmax

    base = embeddings.select(
        F.col(id_col), e.alias("_e"), scale.alias("_scale")
    ).filter(F.col("_scale") > 0)
    recon = F.transform(
        F.col("_e"), lambda x: F.round(x / F.col("_scale")) * F.col("_scale")
    )
    withr = base.withColumn("_r", recon)
    return withr.select(
        id_col,
        F.round(F.col("_scale"), 6).alias("scale"),
        F.round(cosine_similarity(F.col("_e"), F.col("_r")), 6).alias("cos_recon"),
        F.round(
            F.array_max(F.zip_with(F.col("_e"), F.col("_r"), lambda a, b: F.abs(a - b))),
            6,
        ).alias("max_abs_err"),
    )
