"""Vector column expressions over array<float>/array<double> embeddings.

Pure higher-order-function expressions (``zip_with`` + ``aggregate``) —
JVM-side, no Python boundary, so a brute-force scan stays in
whole-stage codegen. Inputs are cast to double first: float32→double is
exact, and all arithmetic then matches a double-precision oracle
bit-for-bit (left-fold summation order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    c = _as_double(a)
    return F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a|·|b|) — same formula as DuckDB's
    ``list_cosine_similarity`` so oracle parity holds to float ulps."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
