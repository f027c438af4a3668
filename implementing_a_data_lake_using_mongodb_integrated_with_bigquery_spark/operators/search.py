"""Inverted index construction and conjunctive keyword search.

The reference's only lookup path is an exact-key probe into a keyed
store (SURVEY.md §2.4 J3, ``src/ingest_weather_data.py:60-62``). For a
document lake the analogous primitive is term lookup: build a
token → postings inverted index once, then answer multi-term queries
as relational operations instead of corpus scans.

Scale shape: the index build is wordcount-shaped (explode distinct
terms → one combiner-reduced shuffle on the term); postings lists are
sorted for determinism and PRE-CUT — an uncapped ``collect_list`` on a
Zipf head term ("the" at 100 TB) is an executor OOM, so a skew-immune
grouped_rank cut bounds the buffer itself to ``max_postings`` and
``df`` is kept exact alongside the truncated list.
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

    The cap is applied BEFORE the collect (r10): a grouped_rank over
    the composite (term, id) range sort keeps a Zipf-head term ("the"
    at 100 TB appears in every document) spread across tasks —
    skew-immune, unlike a per-term window — and the rank ≤ k filter
    bounds every collect_list buffer to ≤ max_postings entries. The
    earlier collect-then-slice form capped the OUTPUT but still
    buffered the head term's corpus-sized postings in one aggregation
    buffer (the round-10 unbounded-buffer lint class). Deterministic:
    ranks follow the (id) total order, array_sort canonicalizes."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.windows import (
        grouped_rank,
    )

    pairs = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("term")
    )
    dfreq = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    head = grouped_rank(pairs, ["term"], [id_col], rank_col="_pr").filter(
        F.col("_pr") <= max_postings
    )
    postings = head.groupBy("term").agg(
        # bounded buffer: ≤ max_postings ids per term by the rank cut
        F.array_sort(F.collect_list(id_col)).alias("postings")
    )
    return dfreq.join(postings, "term").select("term", "df", "postings")


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
