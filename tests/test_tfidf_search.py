"""Unit tests: TF-IDF / BM25 term weighting and inverted-index search."""

from __future__ import annotations

import math

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.search import (
    build_inverted_index,
    keyword_and_search,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.tfidf import (
    bm25_topk,
    term_table,
    tfidf_topk,
)

DOCS = [
    (1, "spark spark join"),
    (2, "join filter scan"),
    (3, "scan scan scan filter"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_term_table_counts_and_lengths(spark):
    rows = {(r.doc_id, r.term): (r.tf, r.dl) for r in term_table(_df(spark)).collect()}
    assert rows[(1, "spark")] == (2, 3)
    assert rows[(3, "scan")] == (3, 4)
    assert (2, "join") in rows and rows[(2, "join")] == (1, 3)


def test_tfidf_matches_manual_formula(spark):
    got = {
        (r.doc_id, r.term): r.tfidf
        for r in tfidf_topk(_df(spark), k=10).collect()
    }
    # df(spark)=1, N=3 → idf = ln(4/2)+1; tf=2
    expect = round(2 * (math.log(4 / 2) + 1), 6)
    assert got[(1, "spark")] == expect
    # ubiquitous-ish term ranks below rare term within doc 1
    assert got[(1, "spark")] > got[(1, "join")]


def test_bm25_rare_term_beats_common_term(spark):
    got = {
        (r.doc_id, r.term): r.bm25 for r in bm25_topk(_df(spark), k=10).collect()
    }
    # within doc 2 all tf=1: the rarer term (df=2 for both join/filter,
    # scan df=2 too) — check exact formula for one cell instead
    n, df, tf, dl, avgdl = 3, 1, 2, 3, (3 + 3 + 4) / 3
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    expect = round(idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6)
    assert abs(got[(1, "spark")] - expect) < 1e-6


def test_topk_truncates_per_doc(spark):
    per_doc = {}
    for r in tfidf_topk(_df(spark), k=1).collect():
        per_doc.setdefault(r.doc_id, []).append(r.term)
    assert all(len(v) == 1 for v in per_doc.values())
    assert set(per_doc) == {1, 2, 3}


def test_inverted_index_postings_sorted_and_capped(spark):
    idx = {r.term: r for r in build_inverted_index(_df(spark)).collect()}
    assert idx["scan"].df == 2 and idx["scan"].postings == [2, 3]
    assert idx["spark"].postings == [1]
    capped = {
        r.term: r
        for r in build_inverted_index(_df(spark), max_postings=1).collect()
    }
    assert capped["scan"].df == 2  # df stays exact past the cap
    assert capped["scan"].postings == [2]  # smallest doc ids kept


def test_keyword_and_search_requires_all_terms(spark):
    got = {r.doc_id: r.n_hits for r in keyword_and_search(_df(spark), ["scan", "filter"]).collect()}
    assert got == {2: 2, 3: 4}  # doc 1 lacks both terms
