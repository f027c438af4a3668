"""Corpus-common shingle (boilerplate/template) detection.

CCNet/Gopher-style pipelines drop or down-weight text dominated by
fragments repeated across many documents (headers, footers, license
blurbs, navigation chrome). The distributed primitive is: shingle each
document into token n-grams, count how many DISTINCT documents each
shingle appears in, and score every document by the fraction of its
shingles that are corpus-common.

Scale shape (100 TB): shingling is map-only; (doc, shingle) pairs are
de-duplicated per document in the same explode pass (``array_distinct``
before the explode — no DISTINCT shuffle over the exploded fact);
document-frequency is ONE hash aggregate bounded by |distinct
shingles|; the common-shingle set joins back by shingle key, which AQE
broadcasts when the boilerplate vocabulary is small (it is — that's
what makes it boilerplate). No windows, no self-joins, no all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
    tokens,
)


def shingles(text_col: str, n: int = 8) -> F.Column:
    """Array of space-joined token ``n``-grams (order-preserving)."""
    t = tokens(text_col)
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i.cast("int"), n)),
        )
    )


def boilerplate_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document boilerplate score: (id, n_shingles, n_common,
    boilerplate_ratio). A shingle is "common" when it occurs in at
    least ``min_docs`` distinct documents; ``boilerplate_ratio`` is the
    6dp fraction of the document's distinct shingles that are common.
    Documents shorter than ``n`` tokens score 0.0 over 0 shingles.
    """
    per_doc = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("_sh"),
    )
    doc_freq = per_doc.groupBy("_sh").agg(
        F.count(F.lit(1)).alias("_n_docs")  # rows are distinct per doc already
    )
    common = doc_freq.filter(F.col("_n_docs") >= min_docs).select(
        "_sh", F.lit(1).alias("_common")
    )
    scored = (
        per_doc.join(common, "_sh", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_common"), F.lit(0))).cast("long").alias("n_common"),
        )
    )
    # left join keeps shingle-less (short) docs in the output at 0/0
    return (
        docs.select(F.col(id_col).alias("_id"))
        .distinct()
        .join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.round(F.col("n_common") / F.col("n_shingles"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("boilerplate_ratio"),
        )
    )
