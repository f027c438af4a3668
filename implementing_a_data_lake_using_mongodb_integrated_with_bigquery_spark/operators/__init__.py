from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.asof import (
    asof_join,
    asof_join_pandas,
    point_in_time_join,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.decontaminate import (
    benchmark_ngrams,
    ngram_overlap,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.collocations import (
    pmi_collocations,
    transition_matrix,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.quantize import (
    quantize_audit,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.drift import (
    ks_drift,
    psi_drift,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dq import (
    expectations_report,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.regression import (
    grouped_linreg,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.diff import (
    snapshot_diff,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup import (
    dedup_against_target,
    duplicate_audit,
    exact_dedup,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.multimodal import (
    decode_media,
    extract_features,
    frame_sample,
    resize_media,
    synthesize_clips,
    synthesize_media,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
    doc_feature_matrix,
    normalize_text,
    normalized_docs,
    source_lang_entropy,
    unigram_logprob_scores,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
    incremental_dedup,
    minhash_banded_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.flatten import (
    flatten_weather,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.graph import (
    partitioned_components,
    connected_components,
    dedup_clusters,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.integrity import (
    fk_filter,
    fk_violations,
    new_rows_only,
    reconcile_counts,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.incremental import (
    agg_state,
    finalize,
    merge_states,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.merge import (
    last_write_wins,
    upsert,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.cohort import (
    cohort_retention,
    funnel,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.pii import (
    k_anonymity_audit,
    pii_scan,
    redact,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.rangejoin import (
    bin_range_join,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.sampling import (
    apportion_budget,
    hash_split,
    mixture_weights,
    split_column,
    resampling_plan,
    stratified_cap,
    temporal_leakage_audit,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.encoding import (
    target_encode,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.scd import (
    scd2_history,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.outliers import (
    winsorize,
    zscore_flags,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.windows import (
    inactivity_gaps,
    max_concurrency,
    sliding_agg,
    top_k_per_group,
    tumbling_agg,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.search import (
    build_inverted_index,
    keyword_and_search,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.sessions import (
    sessionize,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.tfidf import (
    bm25_topk,
    term_table,
    tfidf_topk,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.fuzzy import (
    fuzz_ratio,
    fuzzy_best_match,
    jaro_winkler,
    similarity_score,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    hard_negatives,
    ivf_topk,
    lsh_topk,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.chunking import (
    chunk_documents,
    duplicate_chunks,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.packing import (
    pack_documents,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.pagerank import (
    pagerank,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.skew import (
    salted_join,
)

__all__ = [
    "agg_state",
    "apportion_budget",
    "asof_join",
    "asof_join_pandas",
    "benchmark_ngrams",
    "bin_range_join",
    "bm25_topk",
    "build_inverted_index",
    "chunk_documents",
    "cohort_retention",
    "connected_components",
    "cosine_near_dup_pairs",
    "cosine_topk",
    "decode_media",
    "dedup_against_target",
    "dedup_clusters",
    "doc_feature_matrix",
    "duplicate_audit",
    "duplicate_chunks",
    "exact_dedup",
    "expectations_report",
    "extract_features",
    "finalize",
    "fk_filter",
    "fk_violations",
    "flatten_weather",
    "frame_sample",
    "funnel",
    "fuzz_ratio",
    "fuzzy_best_match",
    "grouped_linreg",
    "hard_negatives",
    "hash_split",
    "inactivity_gaps",
    "incremental_dedup",
    "ivf_topk",
    "jaro_winkler",
    "k_anonymity_audit",
    "keyword_and_search",
    "ks_drift",
    "last_write_wins",
    "lsh_topk",
    "max_concurrency",
    "merge_states",
    "minhash_banded_pairs",
    "minhash_lsh_pairs",
    "mixture_weights",
    "new_rows_only",
    "ngram_jaccard_pairs",
    "ngram_overlap",
    "normalize_text",
    "normalized_docs",
    "pack_documents",
    "pagerank",
    "partitioned_components",
    "pii_scan",
    "pmi_collocations",
    "point_in_time_join",
    "psi_drift",
    "quantize_audit",
    "reconcile_counts",
    "resampling_plan",
    "redact",
    "resize_media",
    "salted_join",
    "scd2_history",
    "sessionize",
    "similarity_score",
    "sliding_agg",
    "snapshot_diff",
    "source_lang_entropy",
    "split_column",
    "stratified_cap",
    "synthesize_clips",
    "synthesize_media",
    "target_encode",
    "temporal_leakage_audit",
    "term_table",
    "tfidf_topk",
    "top_k_per_group",
    "transition_matrix",
    "tumbling_agg",
    "unigram_logprob_scores",
    "upsert",
    "winsorize",
    "zscore_flags",
]
