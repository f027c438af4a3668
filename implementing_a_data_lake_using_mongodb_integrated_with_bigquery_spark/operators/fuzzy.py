"""Fuzzy entity matching: similarity join + per-query argmax.

Re-expresses the reference's place-name resolution
(``src/ingest_places_data.py:50-67``): for each query name, score every
candidate (after an equality pre-filter on country), track the best
match, early-exit on exact match. The reference uses
``fuzz.ratio`` (SequenceMatcher); the Spark-native stand-in is the
Levenshtein ratio ``1 - lev(a,b)/greatest(len(a),len(b))`` over
lowercased names — a documented semantic delta (SURVEY.md §2.9).

Shape: broadcast the (small) query side against the (large) candidate
side — a broadcast nested-loop join the optimizer picks automatically
for a crossJoin with one broadcast input — then a window argmax
partitioned by query. At 100 TB-scale candidate sets, pre-filter with a
cheap blocking predicate (first-letter, length band) before scoring;
``blocking_expr`` hooks that in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
    parallelize,
)


def similarity_score(a: Column, b: Column) -> Column:
    """Levenshtein ratio in [0,1] over lowercased inputs."""
    la, lb = F.lower(a), F.lower(b)
    return F.when(F.greatest(F.length(la), F.length(lb)) == 0, F.lit(1.0)).otherwise(
        1.0
        - F.levenshtein(la, lb).cast("double")
        / F.greatest(F.length(la), F.length(lb)).cast("double")
    )


def fuzzy_best_match(
    queries: DataFrame,
    candidates: DataFrame,
    query_col: str,
    candidate_col: str,
    blocking_expr: Column | None = None,
    min_similarity: float = 0.0,
) -> DataFrame:
    """For each query row, the argmax-similarity candidate row.

    Deterministic tie-break on the candidate string, then its columns'
    order of appearance — mirrors the reference keeping the *first*
    max-scoring candidate (``src/ingest_places_data.py:63-66``).
    """
    scored = parallelize(candidates).crossJoin(F.broadcast(queries))
    if blocking_expr is not None:
        scored = scored.filter(blocking_expr)
    scored = scored.withColumn(
        "similarity", similarity_score(F.col(query_col), F.col(candidate_col))
    ).filter(F.col("similarity") >= min_similarity)
    w = Window.partitionBy(query_col).orderBy(
        F.col("similarity").desc(), F.col(candidate_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
