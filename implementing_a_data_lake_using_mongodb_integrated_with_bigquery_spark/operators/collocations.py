"""PMI collocation extraction — statistically-bound word pairs.

Completes the corpus-statistics family (``operators.text`` token
frequencies, ``operators.tfidf`` document-relative weights) with the
corpus-relative pair statistic: pointwise mutual information
``PMI(a,b) = ln(N·c(a,b) / (c(a)·c(b)))`` over adjacent-token
bigrams. High-PMI pairs are multi-word expressions ("new york");
training-data pipelines use them for tokenizer vocabulary induction
and boilerplate signature mining.

Scale shape: bigram and unigram counts are two wordcount aggregates
(map-side combined, shuffles bounded by |vocab| and |bigram vocab|);
the unigram table joins onto the bigram table twice (head, tail) —
both joins are vocabulary-sized, so AQE broadcasts them under any
realistic corpus/vocab ratio. A min-count filter runs BEFORE the
joins, cutting the long tail (hapax bigrams are PMI noise anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
    tokens,
)


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k adjacent-token collocations by PMI (then bigram asc as
    total-order tiebreak): (w1, w2, n_pair, n_w1, n_w2, pmi).

    N is the total token count (the unigram event space); PMI is
    rounded to 6dp before ranking, per the determinism convention.
    """
    t = tokens(text_col)
    uni = (
        docs.select(F.explode(t).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    bi = (
        docs.select(
            F.explode(
                F.when(F.size(t) < 2, F.array().cast("array<struct<w1:string,w2:string>>"))
                .otherwise(
                    F.zip_with(
                        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                    )
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    n_total = docs.agg(F.sum(F.size(t)).cast("long").alias("n_tokens"))

    joined = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")), "w2")
        .crossJoin(F.broadcast(n_total))
    )
    pmi = F.round(
        F.log(
            (F.col("n_tokens").cast("double") * F.col("n_pair"))
            / (F.col("n_w1").cast("double") * F.col("n_w2"))
        ),
        6,
    )
    # distributed TakeOrdered, not a single-partition global rank
    # window — the bigram-vocab table never funnels through one task
    return (
        joined.select("w1", "w2", "n_pair", "n_w1", "n_w2", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order Markov transition statistics over per-key ordered
    event sequences: (from_state, to_state, n_transitions, p) where p
    is the row-normalized probability P(to | from), 6dp.

    One shuffle on the key for the lag window, then a wordcount-sized
    aggregate on (from, to); normalization attaches via an aggregate+
    equi-join on ``from_state`` (|states| rows, broadcast) — the same
    no-hot-window discipline as ``operators.tfidf``."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    steps = (
        df.select(
            F.lag(state_col).over(w).alias("from_state"),
            F.col(state_col).alias("to_state"),
        )
        .where(F.col("from_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = steps.groupBy("from_state").agg(
        F.sum("n_transitions").alias("_n_from")
    )
    return steps.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("_n_from"), 6).alias("p"),
    )


def bigram_familiarity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram language-model familiarity score per document — the
    bigram sibling of the unigram-LM quality filter
    (``operators.text``): how typical a document's adjacent-token
    pairs are of the corpus that contains it.

    Score = mean corpus frequency of the document's bigram tokens:
    ``sum over doc bigrams of n_corpus(bigram) / n_bigrams_in_doc``.
    The numerator is an exact BIGINT (sum of integer corpus counts,
    occurrence-weighted), so the only float is the final 6dp-rounded
    division — boilerplate and templated docs score high, novel or
    garbled text scores low. Training pipelines threshold or stratify
    on this the same way they use perplexity, without a float LM.

    Emits ``(id, n_bigrams, familiarity)`` for documents with at
    least one bigram (single-token and empty docs have no signal and
    are dropped symmetrically on both engines).

    Scale shape: one wordcount-style aggregate builds the corpus
    bigram table (bounded by bigram-vocab size); per-doc bigram
    occurrences aggregate to (doc, bigram, k) BEFORE the join, so the
    join against the corpus table is vocabulary-shaped on the build
    side and AQE-broadcastable; one final per-doc aggregate. No
    windows, nothing quadratic.
    """
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
        tokens,
    )

    t = tokens(text_col)
    pairs = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.when(
                F.size(t) < 2,
                F.array().cast("array<struct<w1:string,w2:string>>"),
            ).otherwise(
                F.zip_with(
                    F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                    F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            )
        ).alias("p"),
    ).select("_id", "p.w1", "p.w2")
    per_doc = pairs.groupBy("_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("_k")
    )
    corpus = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    return (
        per_doc.join(corpus, ["w1", "w2"])
        .groupBy("_id")
        .agg(
            F.sum("_k").cast("long").alias("n_bigrams"),
            F.sum(F.col("_k") * F.col("_n")).cast("long").alias("_mass"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_bigrams",
            F.round(F.col("_mass") / F.col("n_bigrams").cast("double"), 6).alias(
                "familiarity"
            ),
        )
    )
