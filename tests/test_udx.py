"""Unit tests for the mapInArrow / Python-UDTF execution surface."""

from __future__ import annotations

import math

from pyspark.sql import Row

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.udx import (
    udtf_ngram_counts,
    vector_norms_arrow,
)


def test_vector_norms_arrow_exact_and_ragged(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[3.0, 4.0]),
            Row(vec_id=2, embedding=[1.0, -1.0, 1.0]),
            Row(vec_id=3, embedding=[]),
        ]
    )
    got = {r["vec_id"]: r for r in vector_norms_arrow(df).collect()}
    assert got[1]["l2_norm"] == 5.0 and got[1]["component_sum"] == 7.0
    assert got[2]["l2_norm"] == round(math.sqrt(3.0), 6)
    assert got[2]["component_sum"] == 1.0
    assert got[3]["l2_norm"] == 0.0 and got[3]["component_sum"] == 0.0


def test_vector_norms_arrow_partitioning_invariant(spark):
    rows = [Row(vec_id=i, embedding=[float(i), float(-i)]) for i in range(100)]
    one = sorted(vector_norms_arrow(spark.createDataFrame(rows).coalesce(1)).collect())
    many = sorted(vector_norms_arrow(spark.createDataFrame(rows).repartition(7)).collect())
    assert one == many


def test_udtf_ngram_counts_matches_manual(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b a"), Row(doc_id=2, text="a b x")]
    )
    got = {r["ngram"]: r["n_occurrences"] for r in udtf_ngram_counts(docs, n=2).collect()}
    assert got == {"a b": 3, "b a": 2, "b x": 1}
