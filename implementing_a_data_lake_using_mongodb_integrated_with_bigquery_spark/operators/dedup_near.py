"""Near-duplicate detection over text corpora.

Three strategies, in increasing scale-headroom order:

- ``ngram_jaccard_pairs``: exact Jaccard over 3-gram shingles via an
  inverted shingle index (explode → self-join on shingle → count
  shared → Jaccard). Exact, SQL-expressible (DuckDB oracle), and the
  classic MapReduce formulation: the join is on the shingle key, so
  only documents sharing a shingle ever meet. At 100 TB, cap the
  document frequency of shingles (``max_doc_freq``) — a stop-shingle
  appearing in f docs contributes f² join rows while adding almost no
  Jaccard mass.
- ``minhash_lsh_pairs``: MinHash + LSH banding via
  ``pyspark.ml.feature.MinHashLSH`` — candidate pairs from band-bucket
  collisions only; probabilistic, sub-quadratic, the scale path.
- SimHash (see ``functions.hashing.simhash64``): 64-bit fingerprint;
  near-dup = small Hamming distance, banded by 16-bit sub-keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Document pairs with Jaccard(shingle sets) ≥ threshold.

    Inverted-index join: (doc, shingle) exploded once, self-joined on
    the shingle, shared-count aggregated per pair, Jaccard =
    |∩| / (|A|+|B|-|∩|). One shuffle on the shingle key + one on the
    pair key. ``max_doc_freq`` drops stop-shingles before the join
    (skew guard; changes results only for pairs glued by ubiquitous
    shingles).
    """
    sh = df.select(
        F.col(id_col).alias("doc"), F.explode(shingles(text_col, n)).alias("shingle")
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    a = sh.select(F.col("doc").alias("d1"), "shingle")
    b = sh.select(F.col("doc").alias("d2"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(sizes.select(F.col("doc").alias("d1"), F.col("n_sh").alias("n1")), "d1")
        .join(sizes.select(F.col("doc").alias("d2"), F.col("n_sh").alias("n2")), "d2")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("d1", "d2", "shared", "n1", "n2", "jaccard")


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

    docs = df.select(
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
