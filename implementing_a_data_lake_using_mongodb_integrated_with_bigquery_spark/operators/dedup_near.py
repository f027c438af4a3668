"""Near-duplicate detection over text corpora.

Three strategies, in increasing scale-headroom order:

- ``ngram_jaccard_pairs``: EXACT Jaccard over word n-gram shingles via
  prefix-filtered candidate generation (AllPairs/PPJoin): shingles are
  canonically ordered rarest-first; only each document's prefix
  (first ⌊(1-t)·n⌋+1 shingles) is exploded into the inverted index, so
  popular shingles — the quadratic blowup — almost never enter the
  join, while the prefix-filtering pigeonhole guarantees zero false
  negatives. Candidates are verified with a full ``array_intersect``.
- ``minhash_banded_pairs``: AND-OR banded MinHash LSH from JVM
  built-ins (xxhash64 + array HOFs) with exact verification — the
  probabilistic sub-quadratic scale path.
- ``minhash_lsh_pairs``: same semantics via
  ``pyspark.ml.feature.MinHashLSH`` (kept for parity with the ML
  pipeline ecosystem; the banded variant is faster).
- SimHash (see ``functions.hashing.simhash64``): 64-bit fingerprint;
  near-dup = small Hamming distance, banded by 16-bit sub-keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
    parallelize,
)


def shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles of a text column (array<string>).
    Documents shorter than n tokens yield an empty array."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(c, " ")
    grams = F.when(F.size(toks) < n, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )
    return F.array_distinct(grams)


def _shingle_table(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, shingle-array) with the expensive shingle expression
    computed ONCE, in parallel, and cached (both near-dup algorithms
    reference it three times: index build + two verify joins).

    The non-empty filter is phrased on the raw token count — a cheap
    predicate Catalyst pushes to the scan — NOT on ``size(sh) > 0``,
    which would push the whole shingle expression below the
    repartition exchange and evaluate it single-threaded per input
    split.
    """
    toks_ok = F.size(F.split(F.col(text_col), " ")) >= n
    docs = (
        parallelize(df.filter(toks_ok))
        .select(F.col(id_col).alias("doc"), shingles(text_col, n).alias("sh"))
    )
    return docs.cache()


def _verify_pairs(cand: DataFrame, docs: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against the full
    shingle sets: candidate-keyed joins on d1 then d2.

    Deliberately NO broadcast hint on the doc→shingle map: at corpus
    scale that broadcast OOMs the executors long before 100 TB. Left
    as plain equi-joins, Catalyst/AQE broadcasts whichever side is
    actually under the threshold at runtime — typically the candidate
    set (LSH/prefix filtering keeps it orders of magnitude smaller than
    the corpus) — and degrades to a keyed shuffle join when neither
    fits. The fat (pair × arrays) rows exist only for the candidate
    set, never for the corpus."""
    return (
        cand.join(docs.select(F.col("doc").alias("d1"), F.col("sh").alias("_sh1")), "d1")
        .join(docs.select(F.col("doc").alias("d2"), F.col("sh").alias("_sh2")), "d2")
        .select(
            "d1",
            "d2",
            F.size(F.array_intersect("_sh1", "_sh2")).cast("long").alias("shared"),
            F.size("_sh1").cast("long").alias("n1"),
            F.size("_sh2").cast("long").alias("n2"),
        )
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """EXACT document pairs with Jaccard(shingle sets) ≥ threshold.

    Two exact strategies (``strategy``: auto|counting|prefix):

    - **low t (< 0.5): counting inverted index** — explode (doc,
      shingle), self-join on the shingle, count shared shingles per
      pair, Jaccard from (shared, n1, n2). One join shuffle + one pair
      aggregation; the n1/n2 ride the group-by key, so no join back.
      At low thresholds most shingle-sharing pairs qualify anyway, so
      candidate pruning cannot pay for its own bookkeeping.
    - **high t (≥ 0.5): AllPairs/PPJoin prefix filtering** — shingles
      get a canonical rarest-first order (document frequency asc,
      shingle asc); only each doc's prefix (first ⌊(1-t)·n⌋+1
      shingles) enters the inverted-index self-join, plus a size
      filter (t·n1 ≤ n2 ≤ n1/t); surviving candidates are verified
      with a full ``array_intersect``. Prefix content is the RARE
      shingles, so stop-shingle skew — the quadratic blowup — never
      enters the join. Identical results to the naive |n|² compare.

    ``auto`` picks counting below t=0.7: prefix filtering only pays
    when prefixes are short AND the corpus has a long-tailed (Zipfian)
    shingle distribution — on low-entropy corpora the prefix machinery
    (doc-frequency ranking + per-doc sort) costs more than it prunes.
    Pass ``strategy='prefix'`` explicitly for stop-shingle-skewed data.

    ``max_doc_freq`` additionally drops ubiquitous shingles from
    candidate generation entirely — an approximate mode (can miss pairs
    glued only by stop-shingles); leave None for exact results.
    """
    docs = _shingle_table(df, id_col, text_col, n)
    use_prefix = strategy == "prefix" or (
        strategy == "auto" and (threshold >= 0.7 or max_doc_freq is not None)
    )
    if not use_prefix:
        return _jaccard_counting(docs, threshold)
    return _jaccard_prefix_filtered(docs, threshold, max_doc_freq)


def _jaccard_counting(docs: DataFrame, threshold: float) -> DataFrame:
    sh = docs.select(
        "doc", F.size("sh").cast("long").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    a = sh.select(F.col("doc").alias("d1"), F.col("n_sh").alias("n1"), "shingle")
    b = sh.select(F.col("doc").alias("d2"), F.col("n_sh").alias("n2"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2", "n1", "n2")
        .agg(F.count(F.lit(1)).alias("shared"))
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "shared", "n1", "n2", "jaccard")
    )


def _jaccard_prefix_filtered(
    docs: DataFrame, threshold: float, max_doc_freq: int | None
) -> DataFrame:
    expl = docs.select("doc", F.explode("sh").alias("shingle"))
    dfreq = expl.groupBy("shingle").agg(F.count(F.lit(1)).alias("dfreq"))
    if max_doc_freq is not None:
        dfreq = dfreq.filter(F.col("dfreq") <= max_doc_freq)
    # canonical rarest-first total order per doc; explode only the
    # PREFIX (first ⌊(1-t)·n⌋+1 shingles). Jaccard ≥ t forces overlap
    # ≥ ⌈t·max(n1,n2)⌉, so two qualifying docs must share a prefix
    # shingle (pigeonhole) — no false negatives — while the prefix
    # content is the RARE shingles, so per-key join fan-out stays tiny.
    threshold = float(threshold)
    per_doc = (
        expl.join(dfreq, "shingle")
        .groupBy("doc")
        .agg(
            # bounded buffer: one group = ONE document's shingle set
            # (≤ doc length, a content constant — never corpus-sized)
            F.array_sort(F.collect_list(F.struct("dfreq", "shingle"))).alias("ranked"),
            F.count(F.lit(1)).cast("long").alias("n_sh"),
        )
    )
    prefix_len = (
        F.floor((1.0 - threshold) * F.col("n_sh")).cast("int") + F.lit(1)
    )
    pre = per_doc.select(
        "doc",
        "n_sh",
        F.explode(
            F.slice(
                F.transform(F.col("ranked"), lambda x: x["shingle"]),
                F.lit(1),
                prefix_len,
            )
        ).alias("shingle"),
    )
    a = pre.select(F.col("doc").alias("d1"), F.col("n_sh").alias("n1"), "shingle")
    b = pre.select(F.col("doc").alias("d2"), F.col("n_sh").alias("n2"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("d1") < F.col("d2"))
            # size filter: jac ≥ t ⇒ t·n1 ≤ n2 ∧ t·n2 ≤ n1
            & (F.col("n2") >= threshold * F.col("n1"))
            & (F.col("n1") >= threshold * F.col("n2"))
        )
        .select("d1", "d2")
        .dropDuplicates(["d1", "d2"])
    )
    # exact verification on the full shingle sets — candidate-keyed
    # joins, corpus never broadcast (see _verify_pairs)
    return _verify_pairs(cand, docs, threshold).select(
        "d1", "d2", "shared", "n1", "n2", "jaccard"
    )


def _minhash_expr(j: int, sh_col: str = "sh"):
    # closure factory, NOT `lambda s, j=j: ...` inline: PySpark treats a
    # 2-arg callable passed to F.transform as an (element, index)
    # lambda, which would silently rebind j to the array index and
    # collapse all "seeded" hashes into one hash function
    return F.array_min(F.transform(F.col(sh_col), lambda s: F.xxhash64(F.lit(j), s)))


def minhash_exprs(num_hashes: int, sh_col: str = "sh") -> list:
    """The ``num_hashes`` independent seeded minhash expressions over a
    shingle-array column (seed j = xxhash64 literal prefix)."""
    return [_minhash_expr(j, sh_col) for j in range(num_hashes)]


def band_table(
    docs: DataFrame, num_hashes: int, bands: int, out: str = "doc"
) -> DataFrame:
    """(out, band_val) banded-MinHash index rows for a shingle table —
    the persistable index unit: band key = xxhash64 of each band's r =
    num_hashes/bands minhashes. Shared by ``incremental_dedup`` and the
    streaming ``dedup_stream.incremental_dedup_stream`` (which appends
    admitted documents' band rows to a stored index between
    micro-batches)."""
    r = num_hashes // bands
    assert r * bands == num_hashes, "bands must divide num_hashes"
    sig = docs.select(
        "doc", *[e.alias(f"mh{j}") for j, e in enumerate(minhash_exprs(num_hashes))]
    )
    keys = [
        F.xxhash64(*[F.col(f"mh{b * r + i}") for i in range(r)]) for b in range(bands)
    ]
    return sig.select(
        F.col("doc").alias(out), F.explode(F.array(*keys)).alias("band_val")
    )


def minhash_banded_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """AND-OR banded MinHash LSH built entirely from JVM built-ins
    (``xxhash64`` + array higher-order functions) — no Python, no ML
    pipeline, no model fit.

    Signature: ``num_hashes`` minhashes (min of seeded xxhash64 over
    the shingle set); grouped into ``bands`` bands of r =
    num_hashes/bands rows; band key = hash of its r minhashes. Two
    documents become a candidate pair iff they collide on ≥1 band —
    P(candidate) = 1-(1-s^r)^b, sharply S-shaped around the similarity
    threshold, so dissimilar pairs (the |n|² mass) almost never meet.
    Candidates are then verified with EXACT Jaccard via
    ``array_intersect`` — no false positives, sub-quadratic cost.

    With r=8, b=4: s=0.1 → ~4e-8 candidate rate; s=0.9 → 90% recall,
    s=0.98 → 99.96%. Deeper bands (r=8) matter on low-entropy corpora:
    the global-minimum-hash shingle lands in many documents, so shallow
    bands collide far above the s^r ideal. At 100 TB this is the dedup
    workhorse: one shuffle on band keys, one pair-dedup shuffle, then a
    verify join that only touches the (tiny) candidate set.
    """
    r = num_hashes // bands
    assert r * bands == num_hashes, "bands must divide num_hashes"
    docs = _shingle_table(df, id_col, text_col, n)
    sig = docs.select(
        "doc", *[e.alias(f"mh{j}") for j, e in enumerate(minhash_exprs(num_hashes))]
    )
    band_keys = [
        F.xxhash64(*[F.col(f"mh{b * r + i}") for i in range(r)]) for b in range(bands)
    ]
    # candidates travel as bare (band, id) rows — the shingle arrays
    # only join in for the verified (deduped) candidate pairs
    banded = sig.select(
        "doc", F.explode(F.array(*band_keys)).alias("band_val")
    )
    cand = (
        banded.select(F.col("doc").alias("d1"), "band_val")
        .join(banded.select(F.col("doc").alias("d2"), "band_val"), "band_val")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .dropDuplicates(["d1", "d2"])
    )
    return _verify_pairs(cand, docs, threshold).select("d1", "d2", "jaccard")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hash_tables: int = 8,
    jaccard_distance_threshold: float = 0.8,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs via MinHash LSH banding
    (``pyspark.ml.feature.MinHashLSH``): shingles → binary hashed
    term vectors → minhash signatures → approxSimilarityJoin. Only
    band-bucket collisions are compared, so cost is ~linear in corpus
    size. Seeded → deterministic."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = parallelize(df).select(
        F.col(id_col).alias("doc"), shingles(text_col, n).alias("sh")
    ).filter(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(docs)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, jaccard_distance_threshold, distCol="jaccard_distance"
    )
    return (
        joined.select(
            F.col("datasetA.doc").alias("d1"),
            F.col("datasetB.doc").alias("d2"),
            F.round(F.col("jaccard_distance"), 6).alias("jaccard_distance"),
        )
        .filter(F.col("d1") < F.col("d2"))
        .dropDuplicates(["d1", "d2"])
    )


def incremental_dedup(
    existing: DataFrame,
    incoming: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Append-only ingestion dedup: screen a NEW batch against the
    EXISTING corpus without ever re-pairing the corpus with itself.

    The corpus side is banded once (at real scale its band index is
    precomputed and stored bucketed-by-band, so only the incoming
    batch shuffles); candidates are incoming↔existing band collisions
    only — the |corpus|² mass never enters any join, and within-batch
    pairs are deliberately out of scope (they are the ordinary
    ``minhash_banded_pairs`` run). Candidates verify with EXACT
    Jaccard; an incoming doc is novel iff no verified match exists.

    Output: one row per incoming doc with ≥ n tokens —
    ``(doc_id, is_novel, dup_of, jaccard)`` where ``dup_of`` is the
    smallest matching existing id (deterministic tiebreak) and
    ``jaccard`` that pair's exact similarity; null for novel docs.
    Same r=2/b=16 recall-≈1 banding argument as
    ``minhash_banded_pairs``, so the exact-Jaccard SQL twin is the
    oracle."""
    ex = _shingle_table(existing, id_col, text_col, n)
    inc = _shingle_table(incoming, id_col, text_col, n)
    cand = (
        band_table(inc, num_hashes, bands, "d1")
        .join(band_table(ex, num_hashes, bands, "d2"), "band_val")
        .select("d1", "d2")
        .dropDuplicates(["d1", "d2"])
    )
    verified = (
        cand.join(inc.select(F.col("doc").alias("d1"), F.col("sh").alias("_sh1")), "d1")
        .join(ex.select(F.col("doc").alias("d2"), F.col("sh").alias("_sh2")), "d2")
        .select(
            "d1",
            "d2",
            F.size(F.array_intersect("_sh1", "_sh2")).cast("long").alias("shared"),
            F.size("_sh1").cast("long").alias("n1"),
            F.size("_sh2").cast("long").alias("n2"),
        )
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    best = verified.groupBy("d1").agg(
        F.min("d2").alias("dup_of"),
    )
    best = best.join(
        verified.select("d1", F.col("d2").alias("dup_of"), "jaccard"),
        ["d1", "dup_of"],
    )
    return (
        inc.select(F.col("doc").alias(id_col))
        .join(best.withColumnRenamed("d1", id_col), id_col, "left")
        .select(
            id_col,
            F.col("dup_of").isNull().alias("is_novel"),
            "dup_of",
            "jaccard",
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """EXACT asymmetric shingle-CONTAINMENT pairs: ordered (src, dst)
    with C(src→dst) = |S_src ∩ S_dst| / |S_src| ≥ p/q — the
    subset-duplication detector symmetric Jaccard misses (a short doc
    pasted inside a long one has high containment but low Jaccard;
    containment-based dedup is how training pipelines catch quote
    farms and wrapper pages).

    Exact via ASYMMETRIC prefix filtering: a qualifying pair must
    share ≥ ⌈p·n_src/q⌉ shingles, so src's rarest-first prefix of
    size n_src − ⌈p·n_src/q⌉ + 1 must hit dst's FULL inverted index
    (pigeonhole over any fixed shingle order — lossless). Only
    prefixes are probed (rare shingles — stop-shingle skew never
    enters the join); the full postings are the build side; survivors
    are verified with an exact ``array_intersect``. The threshold is a
    rational p/q and the gate is the exact-integer cross-multiplication
    ``shared·q ≥ n_src·p`` — no float boundary to flake on.
    """
    docs = _shingle_table(df, id_col, text_col, n)
    expl = docs.select("doc", F.explode("sh").alias("shingle"))
    dfreq = expl.groupBy("shingle").agg(F.count(F.lit(1)).alias("dfreq"))
    per_doc = (
        expl.join(dfreq, "shingle")
        .groupBy("doc")
        .agg(
            # bounded buffer: one group = ONE document's shingle set
            # (≤ doc length, a content constant — never corpus-sized)
            F.array_sort(F.collect_list(F.struct("dfreq", "shingle"))).alias(
                "ranked"
            ),
            F.count(F.lit(1)).cast("long").alias("n_sh"),
        )
    )
    prefix_len = F.expr(
        f"cast(n_sh - ((n_sh * {threshold_num} + {threshold_den - 1})"
        f" div {threshold_den}) + 1 as int)"
    )
    pre = per_doc.select(
        F.col("doc").alias("src"),
        F.explode(
            F.slice(
                F.transform(F.col("ranked"), lambda x: x["shingle"]),
                F.lit(1),
                prefix_len,
            )
        ).alias("shingle"),
    )
    cand = (
        pre.join(expl.select(F.col("doc").alias("dst"), "shingle"), "shingle")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return (
        cand.join(
            docs.select(F.col("doc").alias("src"), F.col("sh").alias("_sh1")), "src"
        )
        .join(
            docs.select(F.col("doc").alias("dst"), F.col("sh").alias("_sh2")), "dst"
        )
        .select(
            "src",
            "dst",
            F.size(F.array_intersect("_sh1", "_sh2")).cast("long").alias("shared"),
            F.size("_sh1").cast("long").alias("n_src"),
            F.size("_sh2").cast("long").alias("n_dst"),
        )
        .filter(
            F.col("shared") * threshold_den >= F.col("n_src") * threshold_num
        )
        .withColumn("containment", F.round(F.col("shared") / F.col("n_src"), 6))
    )


def shingle_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Per-group novel-shingle rate — the memorization/diversity audit
    run over a crawl snapshot: a shingle is NOVEL for the smallest doc
    id that contains it (a deterministic, engine-portable attribution
    of "first seen"), and a group whose docs contribute few novel
    shingles is mostly re-crawl. Output per group:
    ``(n_shingles, n_novel, novelty_rate)`` over distinct-per-doc
    shingles.

    Plan: one shingle explode (the irreducible cost, same as every
    near-dup operator), a min-aggregate keyed by shingle (map-side
    combined — the heavy-hitter shingles collapse before the shuffle),
    per-doc counts, then a join back on the doc id and a final tiny
    group aggregate. No pair generation anywhere — linear, not
    quadratic, in the corpus.
    """
    ex = _shingle_table(df, id_col, text_col, n)
    sh = ex.select("doc", F.explode("sh").alias("shingle"))
    per_doc = sh.groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("_n_sh")
    )
    novel = (
        sh.groupBy("shingle")
        .agg(F.min("doc").alias("doc"))
        .groupBy("doc")
        .agg(F.count(F.lit(1)).cast("long").alias("_n_novel"))
    )
    docs = df.select(F.col(id_col).alias("doc"), group_col)
    out = (
        per_doc.join(novel, "doc", "left")
        .join(docs, "doc")
        .groupBy(group_col)
        .agg(
            F.sum("_n_sh").cast("long").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_n_novel"), F.lit(0)))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty_rate", F.round(F.col("n_novel") / F.col("n_shingles"), 6)
        )
    )
    # the cached shingle table stays cached: both aggregate branches of
    # the RETURNED lazy plan read it, so unpersisting here (before any
    # action) would force the explode to run twice (module precedent:
    # the near-dup operators leave _shingle_table's cache to LRU)
    return out


def minhash_merge_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    k: int = 8,
    n: int = 3,
) -> DataFrame:
    """MinHash signature MERGEABILITY audit (the sketch-algebra
    property every distributed near-dup pipeline leans on): for each
    group, the k-slot signature of the group's full shingle set must
    equal the slotwise MIN of the signatures of its two doc-id-parity
    halves — sig(A ∪ B) = min(sig(A), sig(B)). Also reports the
    classic MinHash estimate of J(even-half, odd-half) — the fraction
    of agreeing slots — beside the EXACT Jaccard of the two halves'
    shingle sets, so estimate drift is visible.

    Engine-exact hashing: slot j's hash is ``md5('<j>:' || shingle)``
    compared lexicographically as hex text — identical on Spark and
    DuckDB with no hex→int parsing (the ``operators.sampling`` trick).
    The k slot minima are k conditional MIN aggregates over ONE pass
    of the (group, shingle, parity) table — no ×k row explosion — and
    the halves' exact Jaccard rides the same scan as two more
    aggregates. Two shuffles total (distinct shingle-parity grid, then
    the group rollup), both map-side combined.
    """
    ex = _shingle_table(df, id_col, text_col, n)
    docs = df.select(
        F.col(id_col).alias("doc"),
        group_col,
        F.pmod(F.col(id_col).cast("long"), F.lit(2)).alias("_par"),
    )
    sh = (
        ex.select("doc", F.explode("sh").alias("shingle"))
        .join(docs, "doc")
        .select(group_col, "_par", "shingle")
        .distinct()
    )

    def slot_hash(j: int):
        return F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))

    aggs = []
    for j in range(k):
        h = slot_hash(j)
        aggs += [
            F.min(h).alias(f"_a{j}"),
            F.min(F.when(F.col("_par") == 0, h)).alias(f"_e{j}"),
            F.min(F.when(F.col("_par") == 1, h)).alias(f"_o{j}"),
        ]
    # exact Jaccard of the halves' shingle sets on the same scan: a
    # shingle is in the intersection iff both parities saw it
    per_shingle = sh.groupBy(group_col, "shingle").agg(
        F.max(F.col("_par") == 0).alias("_he"),
        F.max(F.col("_par") == 1).alias("_ho"),
    )
    exact = per_shingle.groupBy(group_col).agg(
        F.sum((F.col("_he") & F.col("_ho")).cast("long"))
        .cast("long")
        .alias("_inter"),
        F.count(F.lit(1)).cast("long").alias("_union"),
    )
    sig = sh.groupBy(group_col).agg(*aggs)
    # coalesce each term: a null comparison (one half empty) must count
    # as 0, not null out the whole Python-level + chain
    merged_ok = sum(
        F.coalesce(
            (
                F.col(f"_a{j}")
                == F.least(
                    F.coalesce(F.col(f"_e{j}"), F.col(f"_o{j}")),
                    F.coalesce(F.col(f"_o{j}"), F.col(f"_e{j}")),
                )
            ).cast("long"),
            F.lit(0),
        )
        for j in range(k)
    )
    agree = sum(
        F.coalesce((F.col(f"_e{j}") == F.col(f"_o{j}")).cast("long"), F.lit(0))
        for j in range(k)
    )
    out = (
        sig.select(
            group_col,
            F.lit(k).cast("long").alias("n_slots"),
            merged_ok.alias("n_merge_equal"),
            F.round(agree / float(k), 6).alias("est_jaccard"),
        )
        .join(exact, group_col)
        .select(
            group_col,
            "n_slots",
            "n_merge_equal",
            "est_jaccard",
            F.round(F.col("_inter") / F.col("_union"), 6).alias("exact_jaccard"),
        )
    )
    # cache stays live for the two aggregate branches (see shingle_novelty)
    return out


def portable_minhash_bands(
    sh_table: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """(doc, band_idx, band_key) banded-MinHash rows using the
    ENGINE-PORTABLE md5-hex hash (first 8 hex chars of
    ``md5('pmh<j>:' || shingle)`` parsed as BIGINT) instead of
    xxhash64 — every value is reproducible in DuckDB SQL, so a
    blocking-quality oracle can recompute the candidate set itself
    rather than argue recall analytically. Band key is the ':'-joined
    string of the band's r minhashes (no second hash needed)."""
    r = num_hashes // bands
    assert r * bands == num_hashes, "bands must divide num_hashes"

    def mh(j: int):
        return F.array_min(
            F.transform(
                F.col("sh"),
                lambda s: F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"pmh{j}:"), s)), 1, 8),
                    16,
                    10,
                ).cast("long"),
            )
        )

    sig = sh_table.select(
        "doc", *[mh(j).alias(f"mh{j}") for j in range(num_hashes)]
    )
    keys = [
        F.concat_ws(
            ":", *[F.col(f"mh{b * r + i}").cast("string") for i in range(r)]
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc", F.posexplode(F.array(*keys)).alias("band_idx", "band_key")
    )


def blocking_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Blocking-quality report for banded-MinHash LSH: pair
    completeness (share of true ≥-threshold pairs surfaced as
    candidates) and reduction ratio (share of the O(n²) pair space the
    blocking never generates) — the two standard entity-resolution
    blocking metrics (Christen 2012). One row.

    Candidates come from the portable band join (block-internal,
    never all-pairs); truth comes from the counting inverted-index
    exact-Jaccard pair set — at evaluation corpus sizes the one
    shingle self-join + pair aggregate beats the prefix filter's
    per-doc canonical sort (measured 2.6 s vs 8.9 s at sf0.1), and a
    100 TB deployment evaluates blocking on a sample anyway. All
    counts are exact integers; the two ratios are single 6dp
    divisions."""
    sh = _shingle_table(df, id_col, text_col, n)
    banded = portable_minhash_bands(sh, num_hashes, bands)
    a = banded.select(F.col("doc").alias("d1"), "band_idx", "band_key")
    b = banded.select(F.col("doc").alias("d2"), "band_idx", "band_key")
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    exact = _jaccard_counting(sh, threshold).select("d1", "d2")
    # one full-outer join + one aggregate yields all three pair counts
    # in a single pass — separate .agg() branches would recompute the
    # banded candidate plan (16 md5 minhashes per doc) once per count
    paired = cand.withColumn("_c", F.lit(1)).join(
        exact.withColumn("_e", F.lit(1)), ["d1", "d2"], "full_outer"
    )
    n_docs = sh.count()
    total_pairs = n_docs * (n_docs - 1) // 2
    counts = paired.agg(
        F.sum(F.coalesce(F.col("_c"), F.lit(0))).cast("long").alias("n_candidates"),
        F.sum(F.coalesce(F.col("_e"), F.lit(0))).cast("long").alias("n_exact"),
        F.sum(
            F.when(F.col("_c").isNotNull() & F.col("_e").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_caught"),
    )
    return counts.select(
        F.lit(n_docs).cast("long").alias("n_docs"),
        "n_exact",
        "n_candidates",
        "n_caught",
        F.round(F.col("n_caught") / F.col("n_exact").cast("double"), 6).alias(
            "pair_completeness"
        ),
        F.round(
            F.lit(1.0) - F.col("n_candidates") / F.lit(float(total_pairs)), 6
        ).alias("reduction_ratio"),
    )


def scurve_expected_expr(r: int, b: int, buckets: int) -> str:
    """The analytic banded-LSH detection probability at a similarity
    bucket's midpoint, as ONE SQL expression string shared verbatim by
    the Spark query and the DuckDB oracle (the engine-exact
    one-builder convention of ``operators.similarity.hyperplanes``):
    ``p(s) = 1 − (1 − s^r)^b`` with ``s = (2·bucket + 1)/(2·buckets)``.

    Both powers are expanded into an EXPLICIT multiplication tree
    (repeated squaring, textual) — ``pow()`` would route through each
    engine's libm and is not ULP-portable, while an identical composed
    float tree over identical inputs is bit-equal on both engines
    (the r9 float-determinism taxonomy, class 1)."""
    s = f"(CAST(2 * bucket + 1 AS DOUBLE) / {2 * buckets}.0)"
    sr = s if r == 1 else "(" + " * ".join([s] * r) + ")"
    t = f"(1.0 - {sr})"

    def _pow(base: str, e: int) -> str:
        if e == 1:
            return base
        half = _pow(base, e // 2)
        sq = f"({half} * {half})"
        return sq if e % 2 == 0 else f"({sq} * {base})"

    return f"round(1.0 - {_pow(t, b)}, 6)"


def lsh_scurve_eval(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    buckets: int = 20,
) -> DataFrame:
    """Per-similarity-bucket S-curve evaluation of banded-MinHash LSH
    (the textbook curve of Leskovec/Rajaraman/Ullman, MMDS ch. 3):
    for each exact-Jaccard bucket, the OBSERVED share of true pairs
    surfaced as band candidates next to the ANALYTIC detection
    probability ``1 − (1 − s^r)^b`` at the bucket midpoint — the
    per-bucket refinement of :func:`blocking_quality`'s single-row
    pair completeness, and the standard way to check that a chosen
    (r, b) puts the curve's transition where the dedup threshold is.

    Buckets are INTEGER: ``least(shared·buckets div union,
    buckets−1)`` — no float boundary can disagree between engines
    (exact duplicates clamp into the top bucket). The expected
    probability is one composed float tree from
    :func:`scurve_expected_expr`, inlined verbatim into both engines.

    Scale shape: candidates from the block-internal band join (never
    all-pairs); the truth side is the counting inverted-index
    self-join :func:`blocking_quality` already uses (evaluation runs
    on a sample at 100 TB); the caught join is amplification-free
    (key = the pair itself) and the final aggregate collapses to
    ≤ ``buckets`` rows map-side."""
    sh = _shingle_table(df, id_col, text_col, n)
    banded = portable_minhash_bands(sh, num_hashes, bands)
    a = banded.select(F.col("doc").alias("d1"), "band_idx", "band_key")
    b = banded.select(F.col("doc").alias("d2"), "band_idx", "band_key")
    # the r12 estimate-miss pin: the distinct candidate-pair aggregate
    # is statically underestimated by Catalyst, and the LEFT caught-
    # join below CAN broadcast it (unlike blocking_quality's full
    # outer) — the 10× probe saw a 335 MB broadcast of 2.6M pairs
    # before this checkpoint; with it the planner sees the TRUE size
    # (broadcasts only when genuinely small, shuffle-joins at scale)
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
        .localCheckpoint(eager=True)
    )
    truth = _jaccard_counting(sh, 0.0).select(
        "d1",
        "d2",
        F.least(
            F.expr(f"(shared * {int(buckets)}) div (n1 + n2 - shared)"),
            F.lit(buckets - 1).cast("long"),
        ).alias("bucket"),
    )
    paired = truth.join(
        cand.withColumn("_c", F.lit(1)), ["d1", "d2"], "left"
    )
    per = paired.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum(F.coalesce(F.col("_c"), F.lit(0))).cast("long").alias(
            "n_caught"
        ),
    )
    r = num_hashes // bands
    return per.select(
        "bucket",
        "n_true",
        "n_caught",
        F.round(F.col("n_caught") / F.col("n_true").cast("double"), 6).alias(
            "observed_rate"
        ),
        F.expr(scurve_expected_expr(r, bands, buckets)).alias(
            "expected_rate"
        ),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MOSS winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): char
    k-gram hashes, keep the MINIMUM hash of every window of ``w``
    consecutive grams, return the distinct (doc, fingerprint) set.

    Winnowing's guarantee: any shared substring of length ≥ k + w − 1
    yields at least one shared selected fingerprint, while the selected
    set is ~2/(w+1) of all gram hashes — the density/recall tradeoff
    that makes substring-overlap detection affordable at corpus scale.

    Engine-portable hashing: the gram hash is the md5 HEX STRING and
    the window minimum is the LEXICOGRAPHIC min — identical on Spark
    and DuckDB with no hex→int parsing (the repo's standard md5-string
    trick). Tie handling is irrelevant to the output: only the SET of
    selected hash values survives the distinct, and a window's min
    VALUE is position-independent.

    Scale shape: the explode is |chars| rows but stays inside one
    whole-stage-codegen span (generate → substring → md5 → window);
    the only shuffle keys on ``id_col`` (high-cardinality), and the
    per-doc window is bounded by document length, never corpus size.
    """
    npos = F.length(F.col(text_col)) - k + 1
    grams = (
        docs.select(
            F.col(id_col),
            F.col(text_col),
            npos.alias("_npos"),
        )
        .where(F.col("_npos") >= w)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.col("_npos"))).alias("_p"),
            F.col(text_col),
            "_npos",
        )
        .select(
            id_col,
            "_p",
            "_npos",
            F.md5(F.substring(F.col(text_col), F.col("_p"), k).cast("binary")).alias("_h"),
        )
    )
    win = Window.partitionBy(id_col).orderBy("_p").rowsBetween(0, w - 1)
    return (
        grams.withColumn("_minh", F.min("_h").over(win))
        .where(F.col("_p") <= F.col("_npos") - w + 1)
        .select(F.col(id_col), F.col("_minh").alias("fingerprint"))
        .distinct()
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = 8,
    w: int = 6,
    max_df: int = 20,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-overlap candidate pairs from winnowed fingerprints —
    the MOSS pipeline: shared selected fingerprints (each appearing in
    at most ``max_df`` docs — overly common grams are discarded, the
    standard too-frequent-to-be-evidence rule that also bounds the
    bucket join at ≤ max_df² pairs per fingerprint), pairs keeping
    ``min_shared``+ shared prints, scored by containment
    (shared / smaller fingerprint set). Never all-pairs."""
    fp = winnow_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
    sizes = fp.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("_nfp"))
    rare = (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= max_df)
        .select("fingerprint")
    )
    kept = fp.join(rare, "fingerprint")
    a = kept.select(F.col("fingerprint"), F.col(id_col).alias("doc_a"))
    b = kept.select(F.col("fingerprint"), F.col(id_col).alias("doc_b"))
    shared = (
        a.join(b, "fingerprint")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fp"))
        .where(F.col("shared_fp") >= min_shared)
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("_nfp").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("_nfp").alias("_nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fp",
            F.round(
                F.col("shared_fp") / F.least("_na", "_nb").cast("double"), 6
            ).alias("containment"),
        )
    )


def substring_dup_spans(
    docs: DataFrame,
    min_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-level EXACT dedup spans (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" —
    the ExactSubstr layer): every maximal token span that appears
    verbatim in ≥2 DISTINCT documents, reported per document as
    (doc_id, span_start, span_end, span_tokens), 1-based token
    positions, whitespace tokens.

    Equivalence to the paper's suffix-array formulation at fixed
    threshold L=``min_tokens``: a cross-doc repeated span of length
    ≥ L exists iff some L-token gram is shared by ≥2 docs, and the
    union of duplicated L-gram start positions, merged into maximal
    runs per doc, is exactly the set of maximal ≥L-token duplicated
    spans (every L-window inside an emitted span is itself duplicated
    somewhere). The suffix array is the single-node data structure;
    this is the distributed shape — hash the grams (linear in corpus
    tokens), two map-side-combinable aggregates, one key join. Corpus²
    never materializes.

    Engine-portable hashing: gram hash = md5 hex STRING of the
    space-joined token slice (the repo's standard md5-string trick —
    identical on Spark and DuckDB, no hex→int parsing).

    Scale shape: |grams| = |tokens| rows, built inside one codegen
    span (split → sequence explode → slice → md5); the (hash, doc)
    dedupe and the per-hash doc count are both hash aggregates with
    partial combine, never buffering a group's values. The
    positions⋈duplicated-hashes join keys on the md5 (high
    cardinality), and per-key join output EQUALS per-key input (each
    position matches at most one dup row), so a pathologically
    frequent gram cannot amplify the join — AQE skew-join splits the
    heavy partition. The run-merge window partitions by ``id_col``
    (high-cardinality; per-doc rows bounded by document length, never
    corpus size — the winnowing/sessionize precedent)."""
    _, hits = _substring_dup_hits(docs, min_tokens, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = hits.withColumn(
        "_grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        runs.groupBy(id_col, "_grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + min_tokens - 1).cast("long").alias("span_end"),
        )
        .select(
            F.col(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
        )
    )


def _substring_dup_hits(
    docs: DataFrame, min_tokens: int, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared detection core of :func:`substring_dup_spans` /
    :func:`substring_dedup_apply`: returns ``(toks, hits)`` where
    ``toks`` is EVERY doc as (id, _t token array, _npos gram count —
    possibly < 1 for short docs) and ``hits`` the duplicated L-gram
    occurrences (id, pos, _h) — grams whose md5 appears in ≥2 distinct
    docs. See the callers' docstrings for the scale argument.

    The gram build (explode → slice → concat → md5 per position) is
    the expression-dense hot loop, so the input is ``parallelize``d
    first (no-op on well-split production tables; spreads the
    single-split test fixture — the module's shingle-path precedent)."""
    toks = parallelize(docs).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_t")
    ).select(
        id_col,
        "_t",
        (F.size("_t") - min_tokens + 1).alias("_npos"),
    )
    grams = toks.where(F.col("_npos") >= 1).select(
        id_col,
        F.explode(F.sequence(F.lit(1), F.col("_npos"))).alias("pos"),
        F.col("_t"),
    ).select(
        id_col,
        "pos",
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("_t"), F.col("pos"), min_tokens)
            ).cast("binary")
        ).alias("_h"),
    )
    # materialize the gram table ONCE (r14): every caller consumes it
    # through several checkpointed branches (dup counts, span decision,
    # gram representatives), and without the pin the expression-dense
    # explode+slice+md5 pass re-ran per branch — 4× in
    # substring_dedup_apply_exact (the multi-branch map-side-expression
    # class, CLAUDE.md). Narrow rows (id, pos, 32-hex hash), |tokens|
    # rows, disk-spilling storage — strictly cheaper than recomputing
    # the md5 pass per branch at any scale.
    grams = grams.localCheckpoint(eager=True)
    # dedupe (hash, doc) first so the per-hash count is DISTINCT docs
    # without count-distinct's Expand node. The eager localCheckpoint
    # is broadcast-safety, not caching: Catalyst's STATIC size estimate
    # of this filtered two-level aggregate is far below its true size
    # (every gram duplicated ⇒ |dup| ~ |grams|), the static plan picks
    # BroadcastHashJoin, and AQE never demotes a statically-planned
    # broadcast — the 10× probe built a 302 MB broadcast (the r11
    # estimate-miss class, executor OOM at 100×). Checkpointing gives
    # the planner the TRUE size, so it broadcasts only when dup is
    # genuinely small and shuffle-joins at scale.
    dup = (
        grams.select("_h", id_col)
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).cast("long").alias("_df"))
        .where(F.col("_df") >= 2)
        .select("_h")
        .localCheckpoint(eager=True)
    )
    hits = grams.join(dup, "_h").select(id_col, "pos", "_h")
    return toks, hits


def _decided_spans(
    hits: DataFrame, min_tokens: int, id_col: str
) -> DataFrame:
    """Shared span-decision core of :func:`substring_dedup_apply` /
    :func:`substring_dedup_apply_exact`: merge the duplicated-gram
    ``hits`` into maximal per-doc runs, group runs by OPENING-gram
    hash, keep the corpus-minimum (doc, span_start) copy per group,
    and return (id, span_start, span_end, _removed).

    The keep_one aggregate output is data-proportional and joined
    against the bigger span side — the eager localCheckpoint gives the
    planner its TRUE size (the r11 estimate-miss guard: a
    statically-underestimated broadcast is never demoted by AQE)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = hits.withColumn("_grp", F.col("pos") - F.row_number().over(w))
    spans = runs.groupBy(id_col, "_grp").agg(
        F.min(F.struct(F.col("pos"), F.col("_h"))).alias("_first"),
        (F.max("pos") + min_tokens - 1).cast("long").alias("span_end"),
    ).select(
        F.col(id_col),
        F.col("_first.pos").cast("long").alias("span_start"),
        "span_end",
        F.col("_first._h").alias("_h0"),
    )
    keep_one = spans.groupBy("_h0").agg(
        F.min(F.struct(F.col(id_col), F.col("span_start"))).alias("_k")
    ).localCheckpoint(eager=True)
    return spans.join(keep_one, "_h0").select(
        id_col,
        "span_start",
        "span_end",
        (
            ~(
                (F.col(id_col) == F.col(f"_k.{id_col}"))
                & (F.col("span_start") == F.col("_k.span_start"))
            )
        ).alias("_removed"),
    )


def substring_dedup_apply(
    docs: DataFrame,
    min_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The CUT step of the Lee et al. 2022 ExactSubstr pipeline:
    rewrite the corpus with cross-doc duplicated spans removed under a
    deterministic first-occurrence representative policy, and certify
    the rewrite with an engine-portable md5 of each document's kept
    text.

    Policy (run-granular): spans are the maximal duplicated runs of
    :func:`substring_dup_spans`; spans are grouped by their OPENING
    gram's hash, and within each group the span at the corpus-minimum
    (doc_id, span_start) is the kept representative — every other
    span in the group is cut whole. Deterministic and total (every
    duplicated opening gram keeps exactly one copy); run-granular
    rather than the paper's token-exact suffix-array cut, which is the
    single-node formulation.

    Returns per document: n_tokens, n_spans_removed, n_tokens_removed,
    n_tokens_kept, kept_md5 (md5 of the space-joined kept tokens;
    NULL when nothing is kept) — ALL docs appear, untouched docs with
    zero removals and kept_md5 = md5(original tokens).

    Over-deletion bound (documented per the r12 ADVICE): the
    run-granular policy guarantees one surviving copy per OPENING-gram
    group, not per duplicated token — a removed run can extend past
    its group representative's span, so tail content duplicated only
    among removed runs can lose every copy. The worst case loses up to
    ``run_length − min_tokens`` tokens of a duplicated tail per group.
    When content preservation matters use
    :func:`substring_dedup_apply_exact`, whose gram-representative
    rescue keeps ≥1 verbatim copy of EVERY duplicated L-gram (its
    removals are a provable subset of this function's — parity-tested).

    Scale shape: detection is :func:`_substring_dup_hits` (linear gram
    table, combinable aggregates, amplification-free join). Spans per
    doc are DISJOINT (merged runs), each ≥ min_tokens, so the per-doc
    cut list is ≤ len(doc)/min_tokens entries — the collect_list
    buffer is bounded by the document's own size/20, strictly smaller
    than the input row every text operator already holds. The rewrite
    itself is MAP-ONLY: the cut list rides a struct array onto the doc
    row and the kept tokens fall out of one higher-order filter — the
    corpus text never shuffles (tokens explode only inside DuckDB's
    oracle; Spark keeps arrays in place)."""
    toks, hits = _substring_dup_hits(docs, min_tokens, id_col, text_col)
    decided = _decided_spans(hits, min_tokens, id_col)
    cuts = (
        decided.where("_removed")
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("span_start", "span_end"))
            ).alias("_cuts"),
            F.count(F.lit(1)).cast("long").alias("n_spans_removed"),
            F.sum(F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("n_tokens_removed"),
        )
        .localCheckpoint(eager=True)
    )
    indexed = F.transform(
        F.col("_t"),
        lambda x, i: F.struct(
            x.alias("tok"), (i + F.lit(1)).cast("long").alias("i")
        ),
    )
    cut_arr = F.coalesce(
        F.col("_cuts"),
        F.array().cast("array<struct<span_start:bigint,span_end:bigint>>"),
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            cut_arr,
            lambda c: (s["i"] >= c["span_start"]) & (s["i"] <= c["span_end"]),
        ),
    )
    n_removed = F.coalesce(F.col("n_tokens_removed"), F.lit(0)).cast("long")
    return toks.join(cuts, id_col, "left").select(
        F.col(id_col),
        F.size("_t").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_spans_removed"), F.lit(0))
        .cast("long")
        .alias("n_spans_removed"),
        n_removed.alias("n_tokens_removed"),
        (F.size("_t") - n_removed).cast("long").alias("n_tokens_kept"),
        F.when(
            (F.size("_t") - n_removed) == 0, F.lit(None).cast("string")
        )
        .otherwise(
            F.md5(
                F.concat_ws(
                    " ", F.transform(kept, lambda s: s["tok"])
                ).cast("binary")
            )
        )
        .alias("kept_md5"),
    )


def substring_dedup_apply_exact(
    docs: DataFrame,
    min_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-exact ExactSubstr cut (Lee et al. 2022 §4.2 semantics:
    keep exactly one verbatim copy of duplicated text, remove the
    rest) — the precision tier above the run-granular
    :func:`substring_dedup_apply`.

    Policy: spans and span representatives are decided exactly as in
    :func:`substring_dedup_apply` (maximal per-doc duplicated runs,
    grouped by opening-gram hash, corpus-minimum copy kept), and every
    KEPT span still survives whole. The difference is inside REMOVED
    spans: any position covered by a GRAM-representative occurrence —
    the corpus-minimum (doc, pos) occurrence of a duplicated L-gram's
    hash — is RESCUED instead of cut. Consequences, both parity-tested:

    * removals ⊆ the run-granular policy's removals (only removed-span
      positions are ever cut, and strictly fewer of them);
    * EVERY duplicated L-gram keeps ≥1 contiguous verbatim copy in the
      rewritten corpus (its corpus-min occurrence lies either in a
      kept span — whole — or in a removed span, where the rescue rule
      protects all L of its positions). This closes the r12 ADVICE
      over-deletion gap: tail content duplicated only among removed
      runs can no longer lose every copy.

    Returns per document: n_tokens, n_spans_removed (removed runs, as
    in the run-granular variant), n_tokens_removed (exact),
    n_tokens_rescued (run-granular removals minus exact removals),
    n_tokens_kept, kept_md5 — ALL docs appear.

    Scale shape: detection and span decision are shared with the run
    variant (linear gram table, combinable aggregates,
    amplification-free joins). The gram-representative table is one
    map-side-combinable min-struct aggregate over the hits (never
    buffering a group), and its per-doc protected intervals are
    interval-MERGED before collection, so the per-doc `_prot` array is
    bounded by the doc's own maximal-run count — dense rescue regions
    collapse to single intervals (a corpus-first doc whose every gram
    is representative collects ONE interval, not len(doc)). The
    rewrite stays MAP-ONLY: removed spans and protected intervals ride
    struct arrays onto the doc row; kept tokens fall out of one
    higher-order filter; corpus text never shuffles."""
    toks, hits = _substring_dup_hits(docs, min_tokens, id_col, text_col)
    # hits feeds TWO independent branches here (the span decision and
    # the gram-representative rescue) — pin it once so the grams⋈dup
    # join doesn't re-run per branch (r14; the multi-branch pin class)
    hits = hits.localCheckpoint(eager=True)
    decided = _decided_spans(hits, min_tokens, id_col)
    cuts = (
        decided.where("_removed")
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("span_start", "span_end"))
            ).alias("_cuts"),
            F.count(F.lit(1)).cast("long").alias("n_spans_removed"),
        )
        .localCheckpoint(eager=True)
    )
    # Gram representatives: corpus-min (doc, pos) per duplicated hash.
    # The min-struct aggregate is map-side combinable; the interval
    # merge below partitions by id_col (high cardinality) and collapses
    # overlapping/adjacent [pos, pos+L-1] windows so the collected
    # per-doc list is bounded by the doc's run count, not its length.
    reps = hits.groupBy("_h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_r")
    ).select(
        F.col(f"_r.{id_col}").alias(id_col),
        F.col("_r.pos").cast("long").alias("_ps"),
        (F.col("_r.pos") + min_tokens - 1).cast("long").alias("_pe"),
    )
    wp = Window.partitionBy(id_col).orderBy("_ps")
    prev_end = F.max("_pe").over(
        wp.rowsBetween(Window.unboundedPreceding, -1)
    )
    merged = (
        reps.withColumn(
            "_new",
            F.when(
                prev_end.isNull() | (F.col("_ps") > prev_end + 1), 1
            ).otherwise(0),
        )
        .withColumn("_ivl", F.sum("_new").over(wp))
        .groupBy(id_col, "_ivl")
        .agg(
            F.min("_ps").alias("_ps"),
            F.max("_pe").alias("_pe"),
        )
    )
    prot = (
        merged.groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("_ps", "_pe"))
            ).alias("_prot")
        )
        .localCheckpoint(eager=True)
    )
    indexed = F.transform(
        F.col("_t"),
        lambda x, i: F.struct(
            x.alias("tok"), (i + F.lit(1)).cast("long").alias("i")
        ),
    )
    cut_arr = F.coalesce(
        F.col("_cuts"),
        F.array().cast("array<struct<span_start:bigint,span_end:bigint>>"),
    )
    prot_arr = F.coalesce(
        F.col("_prot"), F.array().cast("array<struct<_ps:bigint,_pe:bigint>>")
    )

    def _in_cut(s):
        return F.exists(
            cut_arr,
            lambda c: (s["i"] >= c["span_start"]) & (s["i"] <= c["span_end"]),
        )

    def _in_prot(s):
        return F.exists(
            prot_arr, lambda p: (s["i"] >= p["_ps"]) & (s["i"] <= p["_pe"])
        )

    kept = F.filter(indexed, lambda s: ~_in_cut(s) | _in_prot(s))
    rescued = F.filter(indexed, lambda s: _in_cut(s) & _in_prot(s))
    n_kept = F.size(kept).cast("long")
    return toks.join(cuts, id_col, "left").join(prot, id_col, "left").select(
        F.col(id_col),
        F.size("_t").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_spans_removed"), F.lit(0))
        .cast("long")
        .alias("n_spans_removed"),
        (F.size("_t") - n_kept).cast("long").alias("n_tokens_removed"),
        F.size(rescued).cast("long").alias("n_tokens_rescued"),
        n_kept.alias("n_tokens_kept"),
        F.when(n_kept == 0, F.lit(None).cast("string"))
        .otherwise(
            F.md5(
                F.concat_ws(
                    " ", F.transform(kept, lambda s: s["tok"])
                ).cast("binary")
            )
        )
        .alias("kept_md5"),
    )
