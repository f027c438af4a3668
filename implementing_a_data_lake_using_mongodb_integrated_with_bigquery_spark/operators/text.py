"""Text-analysis operators for LLM training-data pipelines.

Generalizes the reference's string surface (SURVEY.md §2.8: lower,
slicing, concat, fuzzy ratio) into corpus-scale text statistics:
tokenization, type/token ratios, quality scoring, language-ID
heuristics, content fingerprinting, corpus token frequencies.

All pure built-in column expressions (split / higher-order array
functions / md5) — JVM-side, codegen'd, no Python in the hot path.
Every operator is deterministic so DuckDB oracles can hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/keyword language-ID
# heuristic. Ordered: earlier languages win argmax ties.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "los", "y", "es", "una"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "and", "of", "is")


def tokens(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def count_in(arr: Column, words: tuple[str, ...]) -> Column:
    """Number of array elements in ``words``."""
    return F.size(F.filter(arr, lambda x: x.isin(*words))).cast("long")


def text_stats(df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None) -> DataFrame:
    """Per-document token statistics: token count, distinct tokens,
    type/token ratio, mean token length."""
    ids = id_cols or ["doc_id"]
    t = tokens(text_col)
    n_tok = F.size(t).cast("long")
    n_distinct = F.size(F.array_distinct(t)).cast("long")
    sum_len = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    ).cast("long")
    return df.select(
        *ids,
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.round(n_distinct / n_tok, 6).alias("type_token_ratio"),
        F.round(sum_len / n_tok, 6).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None) -> DataFrame:
    """Heuristic document quality: stopword density (evidence of real
    prose) and a length factor. Deterministic, bounded [0,1]."""
    ids = id_cols or ["doc_id"]
    t = tokens(text_col)
    n_tok = F.size(t).cast("long")
    n_stop = count_in(t, STOPWORDS)
    stop_ratio = n_stop / n_tok
    length_factor = F.least(F.lit(1.0), n_tok / F.lit(50.0))
    return df.select(
        *ids,
        n_tok.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round((1.0 - stop_ratio) * length_factor, 6).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None) -> DataFrame:
    """Keyword-marker language ID: count per-language marker words,
    argmax with fixed priority order; 'und' (undetermined) if no
    marker hits."""
    ids = id_cols or ["doc_id"]
    t = tokens(text_col)
    hit_cols = {lang: count_in(t, words) for lang, words in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.greatest(*[hit_cols[lang] for lang in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(hit_cols[lang] == best, F.lit(lang))
    return df.select(
        *ids,
        *[hit_cols[lang].alias(f"hits_{lang}") for lang in langs],
        pred.alias("predicted_lang"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None) -> DataFrame:
    """Two content fingerprints per document: md5 of the
    whitespace-normalized text (exact-dup key) and md5 of the sorted
    distinct token vocabulary (bag-of-words dup key, robust to word
    order)."""
    ids = id_cols or ["doc_id"]
    c = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))
    vocab = F.array_join(F.array_sort(F.array_distinct(tokens(text_col))), " ")
    return df.select(
        *ids,
        F.md5(norm).alias("text_fp"),
        F.md5(vocab).alias("vocab_fp"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    top_word_max: float = 0.2,
    top_bigram_max: float = 0.18,
    max_run_max: int = 2,
) -> DataFrame:
    """Gopher-style repetition/boilerplate metrics per document
    (Rae et al. 2021 §A1.1 "repetition removal"): share of the text
    occupied by the single most frequent token, share of token
    transitions occupied by the most frequent bigram, and the longest
    consecutive run of one token. ``repetitive`` flags documents
    exceeding any threshold — the standard pre-training drop rule for
    template/spam pages.

    All three metrics are ARRAY-LOCAL column expressions (higher-order
    functions over the token array) — the operator is map-only: no
    explode, no shuffle, scales linearly with input splits. The most
    frequent element of an array is the longest run of its SORTED
    copy, so every metric is one O(n log n) sort + O(n) fold per
    document; higher-order lambdas are interpreted per element, so the
    naive O(distinct × n) top-count scan is ~100× slower and was
    deliberately avoided.
    """
    ids = id_cols or ["doc_id"]
    t = tokens(text_col)
    n_tok = F.size(t).cast("long")

    def _max_run(arr):
        # Longest run of equal adjacent elements: single left fold,
        # accumulator carries (previous element, current run, best).
        return F.aggregate(
            arr,
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("long"))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        )

    bigrams = F.when(F.size(t) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, (i + 1).cast("int")),
                F.element_at(t, (i + 2).cast("int")),
            ),
        )
    )
    top_word_n = _max_run(F.array_sort(t))
    top_bigram_n = _max_run(F.array_sort(bigrams))
    max_run = _max_run(t)
    top_word_share = F.round(top_word_n / n_tok, 6)
    top_bigram_share = F.when(n_tok >= 2, F.round(top_bigram_n / (n_tok - 1), 6)).otherwise(
        F.lit(0.0)
    )
    return df.select(
        *ids,
        n_tok.alias("n_tokens"),
        top_word_n.alias("top_word_n"),
        top_word_share.alias("top_word_share"),
        top_bigram_n.alias("top_bigram_n"),
        top_bigram_share.alias("top_bigram_share"),
        max_run.alias("max_run_len"),
        (
            (top_word_share > top_word_max)
            | (top_bigram_share > top_bigram_max)
            | (max_run > max_run_max)
        ).alias("repetitive"),
    )


def token_frequencies(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Corpus-level top-k token frequencies (count desc, token asc).
    Explode → two-phase hash aggregate (map-side combine) → tiny
    ordered head; the classic wordcount, shuffle bounded by |vocab|."""
    tok = df.select(F.explode(tokens(text_col)).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    # distributed TakeOrdered (per-partition top-k + merge on the driver
    # of k-row heads), NOT a global single-partition rank window: the
    # full vocab never funnels through one task. The rank window then
    # runs over only the k surviving rows.
    head = counts.orderBy(F.col("n_occurrences").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return head.withColumn("rank", F.row_number().over(w))


# GPT-2-style pre-tokenizer pattern, restricted to the regex subset
# shared by Java regex (Spark) and RE2 (DuckDB): contraction suffixes,
# space-prefixed letter runs, space-prefixed digit runs, space-prefixed
# punctuation runs, residual whitespace. The upstream GPT-2 pattern's
# `\s+(?!\S)` lookahead is dropped (RE2 has no lookahead); the effect
# is that inter-word single spaces attach to the following token and
# only *residual* whitespace runs match the final branch — token
# COUNTS, the quantity a data pipeline budgets by, are unchanged for
# single-space-separated text.
BPE_PRETOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}']+|\s+"


def bpe_tokens(text_col: Column | str) -> Column:
    """Array of BPE-style pre-tokens (the units a byte-pair encoder
    would merge within). Built-in ``regexp_extract_all`` — JVM regex,
    no Python."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_PATTERN), 0)


def bpe_token_stats(
    df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None
) -> DataFrame:
    """Per-document token-count accounting under a BPE-ish pre-tokenizer
    (SURVEY.md §2.10 "token counting: whitespace + a BPE-ish regex").

    Emits both the whitespace count and the pre-token count plus the
    fertility ratio (pre-tokens per whitespace word) — the number that
    converts a 100 TB corpus size into a training-token budget. Map-only:
    no shuffle, no UDF; the regex runs inside whole-stage codegen.
    """
    ids = id_cols or ["doc_id"]
    bpe = bpe_tokens(text_col)
    # drop pure-whitespace matches from the countable-token set
    countable = F.filter(bpe, lambda x: ~x.rlike(r"^\s+$"))
    n_bpe = F.size(countable).cast("long")
    n_ws = F.size(tokens(text_col)).cast("long")
    n_chars = F.length(text_col).cast("long")
    return df.select(
        *ids,
        n_bpe.alias("n_bpe_tokens"),
        n_ws.alias("n_ws_tokens"),
        F.when(n_ws > 0, F.round(n_bpe / n_ws, 6)).otherwise(F.lit(0.0)).alias("fertility"),
        F.when(n_bpe > 0, F.round(n_chars / n_bpe, 6))
        .otherwise(F.lit(0.0))
        .alias("chars_per_token"),
    )


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    keep_threshold: float = -8.0,
) -> DataFrame:
    """Corpus-trained unigram LM quality filter (the CCNet-style
    language-model filter from public training-data pipelines): learn
    token log-probs from the corpus itself, score every document by
    its mean token log-prob, and flag low-probability (gibberish /
    boilerplate-coded) documents.

    Scale shape: one wordcount aggregate (map-side combine, shuffle
    bounded by |vocab|), a distributed TakeOrdered head for the top-K
    vocabulary (never a global rank window), a broadcast join of the
    K-row table onto the exploded tokens, and one per-doc aggregate.
    No Python in the hot path.

    Determinism: per-token log-probs are scaled to integer MICRO-nats
    (``CAST(round(ln(p)*1e6) AS BIGINT)``) before the per-doc sum, so
    the aggregation is an integer sum — partition-order-independent
    and engine-exact (the registry's scaled-integer convention).
    Out-of-vocabulary tokens get the floor log-prob ln(0.5/total).
    """
    toks = df.select(id_col, F.explode(tokens(text_col)).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total_df = counts.agg(F.sum("cnt").cast("long").alias("tot"))
    vocab = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(
        vocab_size
    )
    lp_vocab = vocab.crossJoin(F.broadcast(total_df)).select(
        "token",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("tot")) * 1_000_000
        )
        .cast("long")
        .alias("lp"),
    )
    oov_lp = F.round(F.log(F.lit(0.5) / F.col("tot")) * 1_000_000).cast("long")
    scored = (
        toks.join(F.broadcast(lp_vocab), "token", "left")
        .crossJoin(F.broadcast(total_df))
        .select(id_col, F.coalesce("lp", oov_lp).alias("lp"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("lp").alias("lp_sum")
    )
    score = F.round(
        F.col("lp_sum").cast("double") / F.col("n_tokens") / 1_000_000.0, 6
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        score.alias("lm_score"),
        (score >= F.lit(keep_threshold)).alias("keep"),
    )


def normalize_text(text_col: Column | str) -> Column:
    """Dedup-grade text normalization (the preprocessing step every
    public dedup pipeline applies before shingling): lowercase, strip
    non-alphanumerics to spaces, collapse whitespace runs, trim.
    Pure JVM regex expressions (RE2-portable patterns), map-only."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    lowered = F.lower(c)
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", " ")
    collapsed = F.regexp_replace(stripped, " +", " ")
    return F.trim(collapsed)


def normalized_docs(
    df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None
) -> DataFrame:
    """Per-doc normalized text + the canonical fingerprint of the
    normalized form (what exact-dedup should really key on: raw-byte
    md5 misses case/punctuation-only mutations)."""
    ids = id_cols or ["doc_id"]
    norm = normalize_text(text_col)
    return df.select(
        *ids,
        norm.alias("norm_text"),
        F.md5(norm).alias("norm_fingerprint"),
        F.size(F.split(norm, " ")).cast("long").alias("n_norm_tokens"),
    )


def doc_feature_matrix(
    df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None
) -> DataFrame:
    """Fused per-document feature matrix — every cheap quality signal
    in ONE projection over ONE scan (the featurization row a quality
    classifier trains on). At 100 TB the win is exactly this fusion:
    computing the signals as separate queries rescans the corpus once
    per signal; fused, the scan amortizes across all of them and the
    whole stage stays inside whole-stage codegen. Map-only, no UDF."""
    ids = id_cols or ["doc_id"]
    t = tokens(text_col)
    n_tok = F.size(t).cast("long")
    n_distinct = F.size(F.array_distinct(t)).cast("long")
    n_stop = count_in(t, STOPWORDS)
    n_chars = F.length(text_col).cast("long")
    sum_len = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    ).cast("long")
    n_digitish = F.size(F.filter(t, lambda x: x.rlike("^[0-9]+$"))).cast("long")
    return df.select(
        *ids,
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(n_distinct / n_tok, 6).alias("type_token_ratio"),
        F.round(sum_len / n_tok, 6).alias("avg_token_len"),
        F.round(n_stop / n_tok, 6).alias("stop_ratio"),
        F.round(n_digitish / n_tok, 6).alias("digit_token_ratio"),
        F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")))
        .alias("text_fp"),
    )


def source_lang_entropy(
    df: DataFrame,
    group_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Language-mixture diagnostics per corpus slice: Shannon entropy
    (micro-nats) of the language distribution within each group — the
    standard check that one source hasn't collapsed to a single
    language (entropy→0) or turned into unfiltered noise (entropy→
    ln(n_langs)).

    Determinism: each entropy term ``-p·ln(p)`` is computed from
    EXACT integer counts and rounded to an integer micro-nat BEFORE
    the per-group sum, so the aggregate is an order-free BIGINT sum
    (the registry's scaled-integer convention; same ln-on-exact-ratio
    pattern as ``unigram_logprob_scores``).

    Scale shape: two chained hash aggregates (|group×lang| then
    |group|) plus a broadcast-sized join — counts reduce before any
    math; no windows, no Python.
    """
    sl = df.groupBy(group_col, lang_col).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = sl.groupBy(group_col).agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    p = F.col("n").cast("double") / F.col("n_docs")
    term = F.round(-p * F.log(p) * 1_000_000).cast("long")
    return (
        sl.join(tot, group_col)
        .groupBy(group_col, "n_langs", "n_docs")
        .agg(F.sum(term).cast("long").alias("entropy_micro_nats"))
    )


def bpe_merge_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """First iteration of BPE tokenizer training: corpus-weighted
    adjacent character-pair frequencies — the statistic the merge
    rule argmaxes over (Sennrich et al. 2016). Words are lowercased
    whitespace pre-tokens (alphabetic, length ≥2); each word
    contributes its corpus frequency to every adjacent char pair.

    Scale shape: the corpus collapses to the DISTINCT-word table
    before any pair is generated — one word-count hash aggregate over
    the token explode, then the pair explode runs over |vocab| rows,
    not |corpus| (the decisive reduction: a 100 TB corpus has a
    ~10⁷-row vocabulary). Pair counts are exact BIGINTs; top-k breaks
    ties (count desc, pair asc) for a total order. All JVM-side:
    split/sequence/transform/substring inside whole-stage codegen.
    """
    words = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .select(F.lower("w").alias("word"))
        .filter(F.col("word").rlike("^[a-z]{2,}$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wf"))
    )
    pairs = (
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> substring(word, i, 2))"
                )
            ).alias("pair"),
            "wf",
        )
        .groupBy("pair")
        .agg(F.sum("wf").cast("long").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    k: int = 500,
) -> DataFrame:
    """Vocabulary-coverage / OOV audit: build the top-``k`` whitespace
    token vocabulary by global frequency (count desc, token asc — the
    total-order tiebreak makes the cut deterministic), then report per
    ``group_col`` the token total, OOV count, exact integer per-mille
    OOV rate, and distinct-token count.

    The tokenizer-fit feedback loop of a training pipeline: a source
    whose OOV rate spikes under the corpus vocabulary either needs
    vocab budget or is contaminating the mix.

    Scale: the vocabulary candidate set is the token *aggregate* (one
    hash agg over the exploded tokens, map-side combined); top-k over
    it is a TakeOrdered (no global sort materialization) and the
    result is broadcast back — the exploded token stream is never
    shuffled twice and never joined against anything non-broadcast.
    """
    toks = df.select(
        group_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(k)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.count_if(F.col("in_vocab").isNull()).cast("long").alias("n_oov"),
            F.countDistinct("tok").cast("long").alias("n_unique"),
        )
        .withColumn("oov_permille", F.expr("(n_oov * 1000) div n_tokens"))
    )


# fixed English merge table for tokenizer APPLY (rank order). Merges
# ship with a trained tokenizer — they are model constants at apply
# time, not per-query learned state, so a literal table is the honest
# shape (the learning side is bpe_merge_pair_counts).
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("an", "d"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("o", "u"),
    ("in", "g"),
)


def bpe_apply_tokens(
    df: DataFrame,
    text_col: str = "text",
    merges: tuple[tuple[str, str], ...] = BPE_MERGES,
) -> DataFrame:
    """Apply a fixed BPE merge table to every lowercase-alpha word and
    return one row per produced subword token (column ``tok``).

    Engine-exact construction: each character is wrapped in ``|``
    markers (``the`` → ``|t| |h| |e|``), and each merge (x, y) in rank
    order is ONE literal ``replace('|x| |y|' → '|xy|')`` pass. The
    markers make every match self-delimiting — ``|xt| |h|`` can never
    match the (t, h) pattern, and adjacent occurrences are disjoint —
    so leftmost non-overlapping replace (the shared semantics of Spark
    and DuckDB ``replace``) produces identical tokenizations on both
    engines with zero regex/lookaround dependence. Single-pass-per-
    merge application in rank order is the standard fast
    tokenizer-apply; everything is JVM-side string ops on an exploded
    word stream — map-only, no shuffle until the caller aggregates.
    """
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
    ).where(F.col("w").rlike("^[a-z]+$"))
    sym = F.trim(F.regexp_replace(F.col("w"), "(.)", "|$1| "))
    for x, y in merges:
        sym = F.replace(sym, F.lit(f"|{x}| |{y}|"), F.lit(f"|{x}{y}|"))
    return (
        words.select(F.explode(F.split(sym, " ")).alias("marked"))
        .select(F.replace(F.col("marked"), F.lit("|"), F.lit("")).alias("tok"))
        .where(F.col("tok") != "")
    )


def discriminative_tokens(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    min_token_total: int = 100,
    k: int = 20,
) -> DataFrame:
    """Top-k (token, group) cells by 2×2 chi-square association — the
    source-specific-boilerplate detector: a token whose occurrence is
    wildly over-represented in one source (navigation chrome, license
    headers, template noise) ranks first, flagging what per-source
    cleaning rules should strip.

    All four cell counts (a = n(token, group), b = token_total − a,
    c = group_total − a, d = N − token_total − group_total + a) are
    exact integer aggregates; χ² = N·(ad−bc)² / (T·(N−T)·S·(N−S)) is
    then deterministic scalar float math over those exact integers
    (identical on Spark and DuckDB — no float *aggregation* anywhere),
    rounded to 6dp with a (token, group) total-order tiebreak. Only
    observed cells (a > 0) of tokens with total ≥ ``min_token_total``
    are ranked. Shape: three hash aggs over one exploded token stream,
    a token-keyed join, a broadcast group-totals join, a 1-row N
    broadcast, and a TakeOrdered top-k.
    """
    toks = df.select(
        group_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.col("tok") != "")
    # cells feeds four consumers (itself + the three marginal
    # aggregates): materialize the exploded-stream agg ONCE
    cells = (
        toks.groupBy("tok", group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
        .localCheckpoint(eager=True)
    )
    tok_tot = (
        cells.groupBy("tok")
        .agg(F.sum("a").alias("tt"))
        .filter(F.col("tt") >= min_token_total)
    )
    grp_tot = cells.groupBy(group_col).agg(F.sum("a").alias("ss"))
    total = cells.agg(F.sum("a").alias("nn"))
    j = (
        cells.join(tok_tot, "tok")
        .join(F.broadcast(grp_tot), group_col)
        .crossJoin(F.broadcast(total))
    )
    # each factor is cast to double BEFORE the multiply: a*(nn-tt-ss+a)
    # is ~N² at corpus scale (N~1e12 tokens → overflows int64 / aborts
    # under ANSI mode); doubles hold the counts exactly (< 2^53) and the
    # rounded product is bit-identical on Spark and DuckDB
    d = F.col("nn") - F.col("tt") - F.col("ss") + F.col("a")
    ad_bc = (
        F.col("a").cast("double") * d.cast("double")
        - (F.col("tt") - F.col("a")).cast("double")
        * (F.col("ss") - F.col("a")).cast("double")
    )
    chi2 = F.round(
        F.col("nn").cast("double")
        * ad_bc
        * ad_bc
        / (
            F.col("tt").cast("double")
            * (F.col("nn") - F.col("tt")).cast("double")
            * F.col("ss").cast("double")
            * (F.col("nn") - F.col("ss")).cast("double")
        ),
        6,
    )
    return (
        j.select(
            F.col("tok"),
            F.col(group_col),
            F.col("a").alias("n_cell"),
            F.col("tt").alias("token_total"),
            F.col("ss").alias("group_total"),
            chi2.alias("chi2"),
        )
        .orderBy(F.col("chi2").desc(), F.col("tok").asc(), F.col(group_col).asc())
        .limit(k)
    )


def bpe_fertility(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    merges: tuple[tuple[str, str], ...] = BPE_MERGES,
) -> DataFrame:
    """Tokenizer fertility (subword tokens per word) per group — the
    standard tokenizer-fit metric: a language whose fertility runs hot
    under a fixed merge table pays more sequence length per word, so
    its token budget and packing yield degrade; the number teams check
    before committing a tokenizer to a multilingual mix.

    Same engine-exact marker-framed merge application as
    ``bpe_apply_tokens``, but the subword COUNT per word is read off
    the merged symbol string directly (``size(split(...))``) — no
    second explode, so the whole thing is one map-only pass over the
    exploded word stream plus a single group aggregate. Fertility is a
    single integer/integer division rounded to 6dp."""
    words = df.select(
        group_col, F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
    ).where(F.col("w").rlike("^[a-z]+$"))
    sym = F.trim(F.regexp_replace(F.col("w"), "(.)", "|$1| "))
    for x, y in merges:
        sym = F.replace(sym, F.lit(f"|{x}| |{y}|"), F.lit(f"|{x}{y}|"))
    counted = words.select(
        group_col, F.size(F.split(sym, " ")).cast("long").alias("_n_sub")
    )
    return counted.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("_n_sub").cast("long").alias("n_subwords"),
        F.round(
            F.sum("_n_sub").cast("double") / F.count(F.lit(1)), 6
        ).alias("fertility"),
    )


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 5,
) -> DataFrame:
    """EXECUTED BPE tokenizer training (Sennrich et al. 2016): learn
    the top ``rounds`` merges iteratively — count corpus-weighted
    adjacent symbol pairs on the CURRENT symbolization, argmax with a
    total-order tiebreak (count desc, pair asc), apply the winner as a
    marker-framed literal replace, repeat. Completes the BPE family:
    pair counts (one iteration), fixed-table apply, fertility — this
    is the loop that produces the table.

    Scale shape: the corpus collapses to the distinct-word vocabulary
    ONCE; every round is one hash aggregate over |vocab| rows plus a
    1-row driver collect (the argmax — bounded metadata, the IVF-
    centroid pattern) and a map-only replace. Lineage is cut per round
    with an eager localCheckpoint (the iterative-loop rule). Replace
    semantics are leftmost-non-overlapping on both engines, which IS
    greedy BPE application.

    Returns (merge_rank, pair, n) — the learned merge table with its
    corpus-frequency evidence.
    """
    spark = df.sparkSession
    words = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .select(F.lower("w").alias("word"))
        .filter(F.col("word").rlike("^[a-z]{2,}$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wf"))
    )
    sym = words.select(
        F.trim(F.regexp_replace(F.col("word"), "(.)", "|$1| ")).alias("s"), "wf"
    ).localCheckpoint(eager=True)
    learned: list[tuple[int, str, int]] = []
    for r in range(1, rounds + 1):
        toks = F.split(F.col("s"), " ")
        pairs = sym.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(toks, i.cast("int")),
                        F.element_at(toks, (i + 1).cast("int")),
                    ),
                )
            ).alias("pair"),
            "wf",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("wf").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, n = top[0]["pair"], top[0]["n"]
        learned.append((r, pair, int(n)))
        merged = pair.replace("| |", "")
        sym = sym.withColumn(
            "s", F.replace(F.col("s"), F.lit(pair), F.lit(merged))
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        learned, "merge_rank long, pair string, n long"
    )


def quality_weights(n_buckets: int = 64, scale: int = 1000) -> tuple[list[int], int]:
    """Frozen integer weight vector + bias for the fasttext-style
    linear quality classifier (CCNet §4.2 / Joulin et al. 2017
    inference shape: hashed bag-of-words → mean-pooled linear layer →
    sigmoid threshold). Weights are milli-logit INTEGERS derived
    deterministically from md5 so one Python builder inlines literally
    into BOTH engines (the `hyperplanes`/`pq_codebooks` convention) —
    a real deployment drops in fasttext-exported weights quantized the
    same way; the Spark inference path is identical either way.

    The bias is the OPERATING POINT, not a hash: mean-pooled weights
    over real token distributions land in a narrow band (an md5-drawn
    bias almost surely puts the σ=½ threshold outside it, making
    keep/drop degenerate — observed: every document dropped). -112
    milli-logits sits at the test corpora's median mean-pooled weight
    (~50% keep at sf0.001/0.01/0.1), exactly how practitioners tune a
    quality filter's threshold to a target keep rate (CCNet keeps the
    head/middle tertiles the same way)."""
    import hashlib

    w = [
        int(hashlib.md5(f"qw:{b}".encode()).hexdigest()[:6], 16)
        % (2 * scale + 1)
        - scale
        for b in range(n_buckets)
    ]
    return w, -112


def quality_classifier_scores(
    df: DataFrame,
    weights: list[int],
    bias_milli: int,
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-document linear quality-classifier inference: token →
    feature bucket via the engine-exact md5 hashing trick, mean-pooled
    bucket weight (exact integer: (Σ_t w[h(t)])·1000 div n_tokens)
    plus bias → micro-logit score; keep ⟺ score ≥ 0 ⟺ σ(score) ≥ ½
    (monotone sigmoid needs no float anywhere). The whole scoring pass
    is a per-row higher-order-function expression (F.aggregate over
    the token array with an element_at weight lookup) — JVM-side,
    codegen'd, ZERO shuffles: at 100 TB this is a map-only sweep of
    the corpus, the shape a trained-filter inference pass must have."""
    assert len(weights) == n_buckets
    toks = tokens(text_col)
    warr = F.array(*[F.lit(int(w)).cast("long") for w in weights])
    sum_w = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(
            warr,
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("qcls:"), t)), 1, 4),
                    16,
                    10,
                ).cast("long")
                % n_buckets
                + 1
            ).cast("int"),
        ),
    )
    return df.withColumn("_sum_w", sum_w).withColumn(
        "score_micro",
        F.expr(
            f"(_sum_w * 1000) div cast(size(split({text_col}, ' ')) as bigint)"
            f" + cast({int(bias_milli) * 1000} as bigint)"
        ),
    ).withColumn("keep", (F.col("score_micro") >= 0).cast("long")).drop("_sum_w")
