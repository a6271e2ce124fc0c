"""LLM-training-data pipeline operators (SURVEY.md §2.8 / BASELINE north star).

Every operator is a pure DataFrame→DataFrame function built from native
Spark expressions (no Python row UDFs; the one pandas boundary —
multimodal decode — is Arrow-batched ``mapInPandas``). Each has a mirrored
ANSI-SQL oracle in :mod:`financial_big_data_exp_4_spark.plans.oracle_ext`.
"""

from financial_big_data_exp_4_spark.operators.asof import asof_join
from financial_big_data_exp_4_spark.operators.corpus import (
    bm25_scores,
    chunk_documents,
    inverted_index,
    pack_sequences,
    quality_filter,
    repetition_stats,
    stratified_sample,
    tfidf_top_terms,
)
from financial_big_data_exp_4_spark.operators.graph import (
    connected_components,
    connected_components_twostar,
    dedup_clusters,
    triangle_count,
)
from financial_big_data_exp_4_spark.operators.dedup import (
    apply_exact_dedup,
    signed_docs,
    exact_dedup,
    incremental_neardup,
    minhash_candidate_pairs,
    neardup_edit_distance,
    neardup_verified_pairs,
    ngram_jaccard_adjacent,
    simhash_docs,
    simhash_neardup_pairs,
    with_minhash_signature,
)
from financial_big_data_exp_4_spark.operators.events import (
    cohort_retention,
    gap_fill_hourly,
    event_transitions,
    funnel_counts,
    json_extract_stats,
    moving_value_avg,
    sessionize,
    tumbling_counts,
)
from financial_big_data_exp_4_spark.operators.joins import (
    customers_without_orders,
    range_join_bucketed,
    revenue_by_region,
)
from financial_big_data_exp_4_spark.operators.relational import (
    hash_sample,
    keep_latest,
    merge_changes,
    profile_columns,
    scd2_intervals,
    snapshot_diff,
    standard_scale,
    winsorize,
)
from financial_big_data_exp_4_spark.operators.grouped import (
    group_median_center,
)
from financial_big_data_exp_4_spark.operators.multimodal import (
    decode_image,
    multimodal_metadata,
    resize_images,
    sample_frames,
)
from financial_big_data_exp_4_spark.operators.skew import (
    salted_groupby_count,
    salted_join_small,
)
from financial_big_data_exp_4_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_ivf_kmeans,
    embedding_neardup_pairs,
    hyperplane_neardup_pairs,
    hyperplane_signatures,
)
from financial_big_data_exp_4_spark.operators.text import (
    doc_fingerprint,
    language_id,
    normalize_text,
    scrub_pii,
    text_quality,
    token_counts,
)

__all__ = [
    "apply_exact_dedup",
    "asof_join",
    "gap_fill_hourly",
    "group_median_center",
    "resize_images",
    "salted_groupby_count",
    "salted_join_small",
    "sample_frames",
    "signed_docs",
    "bm25_scores",
    "chunk_documents",
    "cosine_topk_bruteforce",
    "moving_value_avg",
    "scrub_pii",
    "cohort_retention",
    "cosine_topk_ivf",
    "cosine_topk_ivf_kmeans",
    "connected_components",
    "connected_components_twostar",
    "customers_without_orders",
    "decode_image",
    "dedup_clusters",
    "doc_fingerprint",
    "embedding_neardup_pairs",
    "event_transitions",
    "exact_dedup",
    "funnel_counts",
    "hash_sample",
    "hyperplane_neardup_pairs",
    "hyperplane_signatures",
    "incremental_neardup",
    "inverted_index",
    "json_extract_stats",
    "keep_latest",
    "language_id",
    "merge_changes",
    "profile_columns",
    "scd2_intervals",
    "snapshot_diff",
    "standard_scale",
    "winsorize",
    "pack_sequences",
    "quality_filter",
    "repetition_stats",
    "stratified_sample",
    "tfidf_top_terms",
    "minhash_candidate_pairs",
    "neardup_edit_distance",
    "multimodal_metadata",
    "neardup_verified_pairs",
    "ngram_jaccard_adjacent",
    "normalize_text",
    "range_join_bucketed",
    "revenue_by_region",
    "sessionize",
    "simhash_docs",
    "simhash_neardup_pairs",
    "text_quality",
    "token_counts",
    "triangle_count",
    "tumbling_counts",
    "with_minhash_signature",
]
