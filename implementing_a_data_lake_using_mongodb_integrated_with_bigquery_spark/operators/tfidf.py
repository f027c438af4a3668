"""TF-IDF / BM25 term scoring over a document corpus.

Extends the reference's scalar string surface (SURVEY.md §2.8 — lower/
slice/concat over single values, ``src/ingest_places_data.py:55-60``)
to corpus-relative term weighting: the standard relevance scores every
search / keyword-extraction / boilerplate-detection pipeline needs.

Scale shape (three key-partitioned exchanges, all with map-side
partial aggregation, zero Python):

1. tokenize + per-document length map-side, explode, hash-aggregate on
   ``(doc, term)`` — the only corpus-sized shuffle, combiner-reduced;
2. document frequencies via ``groupBy(term)`` + an equi-join back on
   the term — deliberately NOT a ``partitionBy(term)`` window: a window
   would sort every posting of a head term into one partition (Zipf's
   law makes "the" a multi-billion-row partition at 100 TB), while the
   agg+join form combines map-side and lets AQE split a skewed join;
3. per-document top-k ranking window (documents are near-uniform keys).

Corpus-global scalars (N, total token count) ride in via a 1-row
broadcast cross join, never a driver collect.

Determinism convention (registry docstring): tf/df/dl/N are exact
integers; the one float expression is written identically in the
DuckDB oracle and rounded to 6dp BEFORE the ranking window, whose
ordering carries a term-name tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
    tokens,
)


def term_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, term, tf, dl): one row per distinct term per document with
    its in-document occurrence count and the document's token length.
    ``dl`` is computed map-side before the explode so no second
    document-keyed pass is needed."""
    t = tokens(text_col)
    exploded = docs.select(
        F.col(id_col),
        F.size(t).cast("long").alias("dl"),
        F.explode(t).alias("term"),
    )
    return exploded.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )


def _with_df_and_globals(tf: DataFrame, docs: DataFrame, text_col: str) -> DataFrame:
    """Attach df(term) via agg+join (not a term window — see module
    docstring) and corpus scalars via a 1-row broadcast."""
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    globals_ = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(text_col)).cast("long")).alias("sum_dl"),
    )
    return tf.join(dfreq, "term").crossJoin(F.broadcast(globals_))


def _topk(scored: DataFrame, id_col: str, score_col: str, k: int) -> DataFrame:
    w = Window.partitionBy(id_col).orderBy(
        F.col(score_col).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def tfidf_topk(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF:
    ``tf * (ln((N+1)/(df+1)) + 1)`` — the sklearn ``smooth_idf``
    formulation, always positive so rare-term documents still rank."""
    tf = term_table(docs, id_col, text_col)
    j = _with_df_and_globals(tf, docs, text_col)
    score = F.round(
        F.col("tf")
        * (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
        6,
    )
    scored = j.select(id_col, "term", "tf", "df", score.alias("tfidf"))
    return _topk(scored, id_col, "tfidf", k)


def bm25_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k terms per document by Okapi BM25 (Robertson/Sparck Jones):
    ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``. Length normalization
    uses the exact corpus token total, so avgdl is reproducible."""
    tf = term_table(docs, id_col, text_col)
    j = _with_df_and_globals(tf, docs, text_col)
    n, dfc, tfc = F.col("n_docs"), F.col("df"), F.col("tf")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
    norm = tfc + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    # (k1 + 1) is left as a folded expression (not a pre-computed
    # Python float) so Catalyst and the SQL oracle round it identically
    score = F.round(idf * tfc * (F.lit(k1) + F.lit(1.0)) / norm, 6)
    scored = j.select(id_col, "term", "tf", "df", "dl", score.alias("bm25"))
    return _topk(scored, id_col, "bm25", k)


def tfidf_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 10_000,
) -> DataFrame:
    """(doc, term, w_int): smoothed TF-IDF weights scaled to exact
    BIGINTs (``round(tf·idf·scale)``) — the sparse document vectors
    every downstream dot product can sum order-free."""
    tf = term_table(docs, id_col, text_col)
    j = _with_df_and_globals(tf, docs, text_col)
    w = F.col("tf") * (
        F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
        + F.lit(1.0)
    )
    return j.select(
        id_col, "term", F.round(w * scale).cast("long").alias("w_int")
    )


def tfidf_cosine_topk(
    docs: DataFrame,
    probe_max_id: int,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sparse TF-IDF cosine top-k: for each probe document, the k most
    similar other documents under the bag-of-words TF-IDF vector space
    — near-dup/similarity search with NO embedding model, the lexical
    twin of ``operators.similarity.cosine_topk``.

    Scale shape: candidates come from an INVERTED-INDEX equi-join on
    the term (probe postings broadcast; pair space is
    Σ_term df(term)·|probe terms|, never |corpus|²); norms are one
    corpus aggregate joined back on the doc key.

    Determinism: weights are exact scaled BIGINTs, so the pair dot
    product and both norm sums are order-free integer aggregations;
    the only floats are two sqrt's and one division over exact ints —
    identical on any engine, 6dp-rounded before the ranking window
    (doc-id tiebreak).
    """
    # materialize the weighted postings ONCE: three consumers (norms,
    # probe postings, candidate join) would otherwise each re-derive
    # the tokenize+df lineage — triple-scanning the corpus. At scale
    # this is "build the index once", exactly what a real engine does.
    w = tfidf_weights(docs, id_col, text_col).localCheckpoint(eager=True)
    norms = w.groupBy(id_col).agg(
        F.sum(F.col("w_int") * F.col("w_int")).alias("norm2")
    )
    probes = w.filter(F.col(id_col) < probe_max_id).select(
        F.col(id_col).alias("q_id"), "term", F.col("w_int").alias("q_w")
    )
    dots = (
        w.join(F.broadcast(probes), "term")
        .filter(F.col(id_col) != F.col("q_id"))
        .groupBy("q_id", id_col)
        .agg(F.sum(F.col("w_int") * F.col("q_w")).alias("dot"))
    )
    q_norms = norms.select(
        F.col(id_col).alias("q_id"), F.col("norm2").alias("q_norm2")
    )
    scored = (
        dots.join(norms, id_col)
        .join(F.broadcast(q_norms), "q_id")
        .select(
            "q_id",
            id_col,
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("norm2")) * F.sqrt(F.col("q_norm2"))),
                6,
            ).alias("similarity"),
        )
    )
    win = Window.partitionBy("q_id").orderBy(
        F.col("similarity").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )


def bm25_query_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document BM25 relevance for a bag-of-terms query:
    (id, bm25_micro). Each per-(doc,term) BM25 contribution is
    6dp-rounded then scaled to BIGINT micro-units before the sum over
    query terms — integer addition is order-free, so the score is
    reproducible under any partitioning (a raw double sum of even 3
    BM25 terms is not). df(term) is computed over the FULL corpus
    before the query-term filter (BM25's idf is a global statistic);
    only query-term rows reach the final aggregate."""
    tf = term_table(docs, id_col, text_col)
    j = _with_df_and_globals(tf, docs, text_col).filter(F.col("term").isin(*terms))
    n, dfc, tfc = F.col("n_docs"), F.col("df"), F.col("tf")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
    norm = tfc + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    per_term = F.round(idf * tfc * (F.lit(k1) + F.lit(1.0)) / norm, 6)
    return j.groupBy(id_col).agg(
        F.sum(F.round(per_term * scale).cast("long")).alias("bm25_micro")
    )
