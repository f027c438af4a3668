"""Benchmark decontamination: n-gram overlap between corpus and eval set.

Before training, a corpus must be checked for test-set contamination:
any document sharing long-enough word n-grams with a benchmark/eval
set inflates downstream scores and has to be flagged or dropped. The
standard check (exact n-gram collision) is a set-intersection problem
that maps cleanly onto Spark:

  corpus docs → explode distinct n-grams → equi-join on the gram
  against the benchmark's distinct n-gram set → count shared grams
  per document.

Scale shape: the join key is the n-gram string, the benchmark side is
(distinct) benchmark grams — typically millions of rows vs the
corpus's billions, so AQE broadcasts it and the corpus never moves; if
the eval suite is itself huge, the same plan degrades gracefully to a
shuffle join on the gram. No similarity math, no Python — reuses the
``shingles`` expression from the near-dup family (JVM, codegen'd).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
    shingles,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
    parallelize,
)


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """The benchmark's distinct n-gram set — build once per eval
    suite, reuse across corpus sweeps."""
    return (
        benchmark.select(F.explode(shingles(text_col, n)).alias("gram")).distinct()
    )


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(doc, n_shared_grams) for every corpus document sharing at
    least one word n-gram with the benchmark set. ``shingles`` emits
    DISTINCT grams per document, so the count is the size of the
    per-document gram intersection — a direct contamination severity
    measure."""
    d_grams = parallelize(docs).select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("gram")
    )
    b_grams = benchmark_ngrams(benchmark, text_col, n)
    return (
        d_grams.join(b_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
