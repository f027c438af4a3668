"""Similarity search over embedding columns (array<float>).

Two strategies, one semantics (top-k cosine neighbors per query):

- ``cosine_topk``: brute-force scan — the correctness baseline. The
  query side is broadcast, so the big side is a single map-only pass
  (no shuffle of the corpus); cosine is a JVM higher-order-function
  expression, fully codegen'd. At 100 TB this is the fallback path.
- ``ivf_topk``: inverted-file variant — candidates restricted to the
  query's partition (here the precomputed ``label`` cluster id, i.e.
  a coarse quantizer computed upstream). The probe then scans
  |corpus|/|clusters| rows; with the corpus stored partitioned by the
  cluster id, partition pruning makes this sub-linear in files read.

Generalizes the reference's lookup-join J3 (broadcast probe by key,
``src/ingest_weather_data.py:60-62``) from exact keys to nearest
neighbors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.functions.vector import (
    cosine_similarity,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.windows import (
    top_k_per_group,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
    parallelize,
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_emb",
) -> DataFrame:
    """Brute-force top-k cosine neighbors per query (queries broadcast).

    Similarity is rounded to 6 dp *before* ranking so the ordering is
    stable across engines/ulp differences; ties break on neighbor id.
    """
    scored = parallelize(corpus).crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col(query_vec_col)), 6).alias(
            "similarity"
        ),
    )
    return top_k_per_group(
        scored,
        [query_id_col],
        [F.col("similarity").desc(), F.col(id_col).asc()],
        k,
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    partition_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_emb",
) -> DataFrame:
    """IVF-style top-k: only candidates sharing the query's coarse
    cluster (``partition_col``) are scored — an equi-join on the
    cluster id replaces the cross join, so Spark prunes + hashes
    instead of scanning."""
    scored = parallelize(corpus).join(F.broadcast(queries), on=partition_col).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col(query_vec_col)), 6).alias(
            "similarity"
        ),
    )
    return top_k_per_group(
        scored,
        [query_id_col],
        [F.col("similarity").desc(), F.col(id_col).asc()],
        k,
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold among pairs
    sharing a blocking key (coarse cluster) — the blocked self-join
    keeps the pair space |n|²/|blocks| instead of |n|²."""
    corpus = parallelize(corpus)
    a = corpus.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
    )
    b = corpus.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
    )
    pairs = a.join(b, on="_blk").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("_va"), F.col("_vb")), 6).alias(
                "similarity"
            ),
        )
        .filter(F.col("similarity") >= threshold)
    )


def build_ivf_index(
    corpus: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Learn the IVF coarse quantizer: seeded KMeans over the corpus,
    assigning every vector a cluster id. Returns (assigned_df with
    ``ivf_cluster`` column, centroids list). At scale, fit on a sample
    and transform the full corpus; store the corpus partitioned by
    ``ivf_cluster`` so probes prune partitions (see sources.layout)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = parallelize(corpus).withColumn(
        "_features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    # a coarse quantizer needs rough centroids, not convergence — few
    # iterations keep index-build cost ~linear in corpus size
    model = KMeans(
        k=n_clusters, seed=seed, maxIter=8,
        featuresCol="_features", predictionCol="ivf_cluster",
    ).fit(feats)
    assigned = model.transform(feats).drop("_features")
    return assigned, model.clusterCenters()


def ivf_topk_learned(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end learned-quantizer ANN: build the IVF index, take the
    query vectors' own clusters as the probe set, search only there.
    Probabilistic recall (quantizer-dependent) → rows-only check."""
    assigned, _ = build_ivf_index(corpus, n_clusters, id_col, vec_col)
    assigned = assigned.cache()
    q = assigned.filter(F.col(id_col).isin(query_ids)).select(
        F.col("ivf_cluster"),
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_emb"),
    )
    return ivf_topk(
        assigned, q, k, partition_col="ivf_cluster",
        id_col=id_col, vec_col=vec_col,
    )
