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


# Shared surprisal expression of the interpolated Kneser-Ney trigram LM
# (kn_perplexity_filter + its DuckDB oracle build the SAME SQL fragment
# from this template, so both engines execute an IDENTICAL scalar
# expression tree on identical integer count inputs — r9 float-taxonomy
# class 1: composed expression arithmetic is bit-equal; the final
# micro-nat round is the only discretization). `0.75e0` is scientific
# notation deliberately: a bare `0.75` literal parses as DECIMAL in
# both Spark SQL strings and DuckDB, silently switching the arithmetic
# to decimal (the registry's decimal-literal trap).
KN_SURPRISAL_MICRO_SQL = """
CAST(round(-ln(
  (c3 - 0.75e0) / c2 + (0.75e0 * n_follow / c2) * (
    (cont23 - 0.75e0) / tot2 + (0.75e0 * types2 / tot2) * (cont_u / btot)
  )
) * 1000000) AS BIGINT)
""".strip()


def kn_perplexity_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold_micronats: int | None = None,
) -> DataFrame:
    """Interpolated Kneser-Ney trigram-LM perplexity filter — the
    KenLM-class curation page (CCNet §4.1 trains exactly this shape and
    thresholds documents on per-token perplexity; Wenzek et al. 2020).
    Sits between the unigram ``lm_quality_filter`` (operators.text) and
    ``bigram_familiarity`` above: a real backoff LM, trained on the
    corpus itself and applied as a map-shaped scoring pass.

    Model (absolute discount D = 0.75, all quantities derived from the
    corpus trigram-type table — the self-contained convention):

    * ``P(w3|w1,w2) = (c3−D)/c2 + D·N1+(w1 w2 •)/c2 · P(w3|w2)``
    * ``P(w3|w2) = (N1+(• w2 w3)−D)/N1+(• w2 •)
      + D·N1+(w2 •)/N1+(• w2 •) · P(w3)``
    * ``P(w3) = N1+(• w3)/N1+(• •)`` (bigram types from the trigram
      table's (w2,w3) projection).

    Every scored trigram was trained on (count ≥ 1 > D), so no max(·,0)
    guards are needed and every probability is strictly positive. The
    per-trigram surprisal ``−ln P`` is computed ONCE PER TRIGRAM TYPE
    as the shared ``KN_SURPRISAL_MICRO_SQL`` expression on exact
    integer counts, rounded to integer micro-nats (the
    ``jsd_source_divergence`` convention), then occurrence-weighted
    into per-document BIGINT sums — order-free and engine-exact.
    Mean surprisal per token uses integer division (Spark ``div`` /
    DuckDB ``//``, the pinned pair).

    Operating point: the score distribution SHIFTS with corpus size
    (a bigger corpus has more trigram types, so typical surprisal
    rises — measured sf0.01 median 3.03M vs sf0.1 median 3.35M
    micro-nats), so a frozen ABSOLUTE threshold cannot hold a keep
    rate across SFs. The default is therefore distribution-RELATIVE
    (the CLAUDE.md r11 calibrated-operating-point rule, and what CCNet
    actually does — it thresholds on perplexity-distribution
    percentiles, not absolute perplexity): keep = mean_micronats ≤ the
    corpus MEAN of mean_micronats, computed as an exact integer
    ``SUM div COUNT`` — order-free, engine-identical, ~50% keep at
    every SF. Pass ``keep_threshold_micronats`` to pin an absolute
    operating point instead.

    Emits ``(id, n_trigrams, surprisal_micronats, mean_micronats,
    keep)`` for documents with ≥1 trigram (shorter docs carry no
    signal and drop symmetrically on both engines).

    Overflow audit (r11 discipline): per-trigram micro-nat surprisal is
    bounded by −ln(D²·1/N1+(••))·1e6 ≈ 2·ln(corpus bigram types)·1e6 ≲
    6e7 at 100 TB; an occurrence-weighted doc sum wraps a LONG only
    past ~1.5e11 tokens IN ONE DOCUMENT — five orders of magnitude of
    margin over any real document. The relative-threshold sum
    (Σ mean_micronats ≤ 6e7·|docs|) wraps past ~1.5e11 documents;
    a 100 TB corpus of ≥1 KB docs has ≤1e11 — documented ≥30× margin.

    Scale shape: one explode builds trigram occurrences (scanned twice
    — cheap projection, the ``_substring_dup_hits`` precedent); the
    trigram-TYPE table and every model table derived from it get eager
    ``localCheckpoint``s — they are data-proportional aggregates joined
    against bigger sides, the r12 statically-underestimated-broadcast
    class that AQE never demotes. Scoring decorates trigram TYPES (not
    occurrences) through four keyed joins, then one amplification-free
    (doc, trigram)→type join and a per-doc hash aggregate. No windows,
    nothing quadratic, corpus text never shuffles past the explode.
    """
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
        tokens,
    )

    t = tokens(text_col)
    n3 = F.greatest(F.size(t) - 2, F.lit(0))
    occ = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.when(
                F.size(t) < 3,
                F.array().cast("array<struct<w1:string,w2:string,w3:string>>"),
            ).otherwise(
                F.zip_with(
                    F.slice(t, 1, n3),
                    F.zip_with(
                        F.slice(t, 2, n3),
                        F.slice(t, 3, n3),
                        lambda b, c: F.struct(b.alias("w2"), c.alias("w3")),
                    ),
                    lambda a, bc: F.struct(
                        a.alias("w1"), bc["w2"].alias("w2"), bc["w3"].alias("w3")
                    ),
                )
            )
        ).alias("g"),
    ).select("_id", "g.w1", "g.w2", "g.w3")
    tri = (
        occ.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("c3"))
        .localCheckpoint(eager=True)
    )
    big = (
        tri.groupBy("w1", "w2")
        .agg(
            F.sum("c3").cast("long").alias("c2"),
            F.count(F.lit(1)).cast("long").alias("n_follow"),
        )
        .localCheckpoint(eager=True)
    )
    lvl2 = (
        tri.groupBy("w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("cont23"))
        .localCheckpoint(eager=True)
    )
    w2stats = (
        lvl2.groupBy("w2")
        .agg(
            F.sum("cont23").cast("long").alias("tot2"),
            F.count(F.lit(1)).cast("long").alias("types2"),
        )
        .localCheckpoint(eager=True)
    )
    uni = (
        lvl2.groupBy("w3")
        .agg(F.count(F.lit(1)).cast("long").alias("cont_u"))
        .localCheckpoint(eager=True)
    )
    btot = lvl2.agg(F.count(F.lit(1)).cast("long").alias("btot"))
    scored_types = (
        tri.join(big, ["w1", "w2"])
        .join(lvl2, ["w2", "w3"])
        .join(w2stats, "w2")
        .join(uni, "w3")
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            "w3",
            F.expr(KN_SURPRISAL_MICRO_SQL).alias("_micro"),
        )
    )
    per_doc = occ.groupBy("_id", "w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("_k")
    )
    doc_scores = (
        per_doc.join(scored_types, ["w1", "w2", "w3"])
        .groupBy("_id")
        .agg(
            F.sum("_k").cast("long").alias("n_trigrams"),
            F.sum(F.col("_k") * F.col("_micro"))
            .cast("long")
            .alias("surprisal_micronats"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_trigrams",
            "surprisal_micronats",
            F.expr("surprisal_micronats div n_trigrams").alias(
                "mean_micronats"
            ),
        )
    )
    if keep_threshold_micronats is not None:
        return doc_scores.select(
            "*",
            (F.col("mean_micronats") <= keep_threshold_micronats).alias(
                "keep"
            ),
        )
    # Relative operating point: both branches below must see ONE
    # materialization (multi-reference pin; also |docs|-sized — tiny
    # next to the corpus), and the 1-row threshold is a domain-bounded
    # broadcast per the r11 hint policy.
    doc_scores = doc_scores.localCheckpoint(eager=True)
    thr = doc_scores.agg(
        F.expr("sum(mean_micronats) div count(1)").alias("_thr")
    )
    return doc_scores.crossJoin(F.broadcast(thr)).select(
        id_col,
        "n_trigrams",
        "surprisal_micronats",
        "mean_micronats",
        (F.col("mean_micronats") <= F.col("_thr")).alias("keep"),
    )
