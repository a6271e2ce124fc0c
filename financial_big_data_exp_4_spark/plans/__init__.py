from financial_big_data_exp_4_spark.plans.extensions import EXTENSION_QUERIES
from financial_big_data_exp_4_spark.plans.oracle import (
    REFERENCE_ORACLE_SQL as _REF_SQL,
)
from financial_big_data_exp_4_spark.plans.oracle_ext import (
    EXTENSION_ORACLE_SQL,
)
from financial_big_data_exp_4_spark.plans.reference import (
    REFERENCE_QUERIES as _REF_QUERIES,
)

#: Full declared-query registry: reference surface (SURVEY §2) + LLM-data
#: pipeline extensions (SURVEY §2.8). Names must be unique across both.
#:
#: Ordering matters: the driver's correctness gate samples the FIRST 50
#: entries, and rounds 2-4 all sampled the same prefix, leaving 48 queries
#: with only the local gate as a hard check. `_SAMPLE_FIRST` front-loads
#: exactly those never-driver-sampled names, plus q_feature_pipeline (red
#: in r03/r04 on an oracle-side HUGEINT rendering issue, fixed this round)
#: so its fix gets an independent driver verdict. Every name must still
#: exist in the merged dict; the asserts below enforce that.
_SAMPLE_FIRST = [
    "q_feature_pipeline",
    "q_quality_filter",
    "q_repetition",
    "q_tfidf",
    "q_seq_pack",
    "q_stratified_sample",
    "q_inverted_index",
    "q_neardup_verified",
    "q_dedup_clusters",
    "q_group_center",
    "q_approx_distinct",
    "q_skew_agg",
    "q_lineitem_pricing",
    "q_shipping_priority",
    "q_skew_join",
    "q_gap_fill",
    "q_running_total",
    "q_correlation",
    "q_curation_yield",
    "q_sql_surface",
    "q_ntile",
    "q_stream_dedup",
    "q_stream_range_join",
    "q_semi_join",
    "q_moving_avg",
    "q_dedup_apply",
    "q_pii_scrub",
    "q_approx_percentile",
    "q_merge_upsert",
    "q_scd2",
    "q_winsorize",
    "q_doc_chunks",
    "q_bm25",
    "q_embed_lsh",
    "q_funnel",
    "q_cohort_retention",
    "q_profile",
    "q_table_diff",
    "q_embed_lsh_pairs",
    "q_window_stats",
    "q_transitions",
    "q_standard_scale",
    "q_local_supplier_volume",
    "q_large_orders",
    "q_triangle_count",
    "q_semantic_dedup",
    "q_stream_stateful",
    "q_dedup_incremental",
    "q_range_frame",
]

_MERGED = {**_REF_QUERIES, **EXTENSION_QUERIES}
_MERGED_SQL = {**_REF_SQL, **EXTENSION_ORACLE_SQL}
_SF = set(_SAMPLE_FIRST)
assert _SF <= set(_MERGED), sorted(_SF - set(_MERGED))

REFERENCE_QUERIES = {
    **{name: _MERGED[name] for name in _SAMPLE_FIRST},
    **{n: q for n, q in _MERGED.items() if n not in _SF},
}
REFERENCE_ORACLE_SQL = {
    **{n: _MERGED_SQL[n] for n in _SAMPLE_FIRST if n in _MERGED_SQL},
    **{n: q for n, q in _MERGED_SQL.items() if n not in _SF},
}

assert len(REFERENCE_QUERIES) == len(_REF_QUERIES) + len(EXTENSION_QUERIES)
assert len(REFERENCE_ORACLE_SQL) == len(_MERGED_SQL)
assert set(REFERENCE_ORACLE_SQL) <= set(REFERENCE_QUERIES)

__all__ = [
    "EXTENSION_ORACLE_SQL",
    "EXTENSION_QUERIES",
    "REFERENCE_ORACLE_SQL",
    "REFERENCE_QUERIES",
]
