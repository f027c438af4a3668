"""Inverted index construction and conjunctive keyword search.

The reference's only lookup path is an exact-key probe into a keyed
store (SURVEY.md §2.4 J3, ``src/ingest_weather_data.py:60-62``). For a
document lake the analogous primitive is term lookup: build a
token → postings inverted index once, then answer multi-term queries
as relational operations instead of corpus scans.

Scale shape: the index build is wordcount-shaped (explode distinct
terms → one combiner-reduced shuffle on the term); postings lists are
sorted for determinism and CAPPED — an uncapped ``collect_list`` on a
Zipf head term ("the" at 100 TB) is an executor OOM, so the cap rides
a size guard and ``df`` is kept exact alongside the truncated list.
Conjunctive (AND) search never builds postings at all: it filters the
term table to the query terms (predicate pushes to the scan), then one
hash aggregate per document checks that ALL terms matched — corpus
rows for non-query terms are dropped at the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
    tokens,
)


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 1000,
) -> DataFrame:
    """(term, df, postings): exact document frequency plus the sorted
    postings list truncated to the ``max_postings`` smallest doc ids.
    Deterministic: collect_list order is normalized by array_sort
    before the cap."""
    pairs = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("term")
    )
    return pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.slice(F.array_sort(F.collect_list(id_col)), 1, max_postings).alias(
            "postings"
        ),
    )


def keyword_and_search(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents containing EVERY term in ``terms``, scored by total
    occurrence count: (doc, n_hits). The per-term filter runs before
    the explode's output is aggregated, so only query-term rows ever
    reach the shuffle; AND semantics are a count-distinct-equals-N
    check inside the same aggregate (no per-term self-joins)."""
    n_terms = len(set(terms))
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term")).filter(
        F.col("term").isin(*terms)
    )
    return (
        tok.groupBy(id_col)
        .agg(
            F.count_distinct(F.col("term")).alias("_n_matched"),
            F.count(F.lit(1)).alias("n_hits"),
        )
        .filter(F.col("_n_matched") == n_terms)
        .select(id_col, "n_hits")
    )


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    k: int = 60,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N (id, rank)
    tables — the standard hybrid-retrieval combiner (lexical ⊕ dense ⊕
    …). Each ranking contributes ``round(scale / (k + rank))`` in
    BIGINT micro-units; an id absent from a ranking contributes 0. The
    fused score is therefore an integer sum of per-ranking row-level
    expressions — no float aggregation, identical on any engine.

    Output: (id, rank_<name>… nullable, rrf_micro). Rankings are tiny
    (top-N head tables), so the chained full-outer joins never touch
    the corpus."""
    fused = None
    for name, r in rankings:
        r = r.select(F.col(id_col), F.col("rank").alias(f"rank_{name}"))
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    contribs = [
        F.coalesce(
            F.round(F.lit(float(scale)) / (F.lit(k) + F.col(f"rank_{name}"))).cast("long"),
            F.lit(0).cast("long"),
        )
        for name, _ in rankings
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return fused.select(
        id_col,
        *[F.col(f"rank_{name}") for name, _ in rankings],
        total.alias("rrf_micro"),
    )
