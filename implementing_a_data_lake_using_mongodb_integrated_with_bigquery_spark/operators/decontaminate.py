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


def contamination_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    min_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bench_df: int = 20,
) -> DataFrame:
    """Longest-contiguous-collision decontamination report (the GPT-3
    appendix-C / Lee et al. measurement): for every corpus document
    sharing a verbatim ≥``min_tokens``-token span with the benchmark,
    the LENGTH of its longest such span, the benchmark doc achieving
    it, and how many benchmark docs it collides with — span-granular
    severity where :func:`ngram_overlap` gives a shared-gram count
    (13 scattered 3-grams and one verbatim 40-token quote score very
    differently here, and it's the quote that invalidates an eval).

    Method: positional L-token-gram md5 tables on both sides; matches
    joined on the hash land on DIAGONALS (corpus_pos − bench_pos is
    constant along a shared span), so the longest span per (corpus
    doc, bench doc) is the longest consecutive corpus-position run
    within a diagonal + L − 1 — the distributed form of the
    suffix-array longest-match scan, three combinable aggregates
    deep.

    Scale shape: gram builds are the linear expression-dense loop
    (``parallelize`` precedent); the bucket join is rarity-capped on
    the BENCHMARK side (grams occurring > ``max_bench_df`` times in
    the benchmark are too common to be contamination evidence — the
    winnowing max_df rule), so per corpus hit the pair fanout is
    ≤ max_bench_df, never |bench|. The capped bench-gram table is
    eagerly localCheckpoint'd: join planning sees its TRUE size (the
    r12 estimate-miss guard), broadcasting a small eval suite and
    shuffle-joining a huge one. Diagonal run-merge windows partition
    by the high-cardinality (corpus doc, bench doc, diagonal) key,
    bounded by document length."""

    def posgrams(df: DataFrame, name: str) -> DataFrame:
        toks = parallelize(df).select(
            F.col(id_col).alias(name),
            F.split(F.col(text_col), " ").alias("_t"),
        ).select(
            name, "_t", (F.size("_t") - min_tokens + 1).alias("_np")
        )
        return toks.where(F.col("_np") >= 1).select(
            name,
            F.explode(F.sequence(F.lit(1), F.col("_np"))).alias(
                f"{name}_pos"
            ),
            F.col("_t"),
        ).select(
            name,
            f"{name}_pos",
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(F.col("_t"), F.col(f"{name}_pos"), min_tokens),
                ).cast("binary")
            ).alias("_h"),
        )

    from pyspark.sql import Window

    c = posgrams(docs, "cd")
    b = posgrams(benchmark, "bd")
    bkeep = (
        b.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") <= max_bench_df)
        .select("_h")
    )
    b2 = b.join(bkeep, "_h").localCheckpoint(eager=True)
    pairs = c.join(b2, "_h").select(
        "cd",
        "bd",
        "cd_pos",
        (F.col("cd_pos") - F.col("bd_pos")).alias("_diag"),
    )
    w = Window.partitionBy("cd", "bd", "_diag").orderBy("cd_pos")
    runs = pairs.withColumn(
        "_grp", F.col("cd_pos") - F.row_number().over(w)
    )
    per_pair = (
        runs.groupBy("cd", "bd", "_diag", "_grp")
        .agg(
            (F.max("cd_pos") - F.min("cd_pos") + min_tokens)
            .cast("long")
            .alias("_span")
        )
        .groupBy("cd", "bd")
        .agg(F.max("_span").alias("_best_span"))
    )
    return per_pair.groupBy(F.col("cd").alias(id_col)).agg(
        F.max("_best_span").cast("long").alias("longest_span_tokens"),
        F.min(
            F.struct(
                (-F.col("_best_span")).alias("_ns"), F.col("bd").alias("_bd")
            )
        )["_bd"]
        .cast("long")
        .alias("best_bench_doc"),
        F.count(F.lit(1)).cast("long").alias("n_bench_docs"),
    )
