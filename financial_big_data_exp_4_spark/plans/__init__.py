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
#: entries of this registry each round, so which half of the 99 declared
#: queries gets a fresh *driver* verdict is decided here.
#:
#: ALTERNATION POLICY (round-5 VERDICT #2): the registry front-loads one
#: half of the queries per round, and the prefix is SWAPPED every round so
#: each half is re-verified by the external driver on alternating rounds
#: (the full 99 always run under the local gate, `tools/check_correctness.py`,
#: regardless). History: rounds 2-4 sampled the reference surface +
#: minhash/simhash/embedding families; round 5 sampled the other half;
#: round 6 swapped back to the r02-r04 half; rounds 7 AND 8 both sampled
#: the complement of CORRECTNESS_r06 (round 8 shipped no commits, so the
#: swap was skipped and the alternation guard went red); round 9 sampled
#: the exact complement of the r07/r08 driver sample; round 10 sampled
#: the complement of CORRECTNESS_r09.json's keys; round 11 sampled the
#: complement of CORRECTNESS_r10.json's; round 12 sampled the complement
#: of CORRECTNESS_r11.json's; round 13 sampled the complement of
#: CORRECTNESS_r12.json's keys plus both anchors; round 14 sampled the
#: complement of CORRECTNESS_r13.json's keys plus the q_scan anchor;
#: round 15 (this prefix) swaps to the complement of
#: CORRECTNESS_r14.json's keys. The registry grew to 102 queries in
#: round 14, so that complement is 52 names — two over the 50-slot pin
#: after the q_scan anchor. The r15 VERDICT mandate is that the three
#: queries added in round 14 (q_lm_bigram, q_hopping_window,
#: q_embed_quantize — no driver CORRECTNESS row yet) MUST be in this
#: sample; the three names dropped to make room (q_project, q_topk,
#: q_interest) are trivial reference-surface queries, untouched since
#: round 2 and hash-green in the r13 driver run.
#: To rotate next round: replace with the complement of this round's
#: CORRECTNESS keys, topped up to exactly 50 with q_scan first — the
#: list is pinned to length 50 (round-6 ADVICE: the old 49-name list left
#: slot 50 to dict-order chance), and `tests/test_rotation.py` fails
#: loudly if the prefix was not swapped from the previous committed round.
#: Every name must exist in the merged dict; the asserts below enforce it.
_SAMPLE_FIRST = [
    "q_scan",
    "q_anti_join",
    "q_asof_join",
    "q_cube",
    "q_dedup_exact",
    "q_dedup_latest",
    "q_dedup_simhash",
    "q_distinct_agg",
    "q_doc_fingerprint",
    "q_embed_ann_ivf",
    "q_embed_ann_kmeans",
    "q_embed_cosine_topk",
    "q_embed_neardup",
    "q_embed_quantize",
    "q_employer_share",
    "q_feature_pipeline",
    "q_fillna",
    "q_grouping_sets",
    "q_hash_sample",
    "q_hopping_window",
    "q_industry_count",
    "q_json_extract",
    "q_lang_id",
    "q_lm_bigram",
    "q_loan_histogram",
    "q_multimodal_frames",
    "q_multimodal_meta",
    "q_neardup_edit",
    "q_neardup_minhash",
    "q_ngram_jaccard",
    "q_percentile",
    "q_pivot",
    "q_quantile_bucket",
    "q_random_split",
    "q_range_join",
    "q_rollup",
    "q_sessionize",
    "q_set_ops",
    "q_simhash_neardup",
    "q_star_join",
    "q_stream_sessions",
    "q_stream_tumbling",
    "q_string_index",
    "q_text_normalize",
    "q_text_quality",
    "q_token_count",
    "q_tumbling_window",
    "q_vector_assemble",
    "q_window_rank",
    "q_workyear_filter",
]

#: The driver samples exactly the first 50 registry entries; pin the prefix
#: to that length so every sampled slot is an intentional choice.
assert len(_SAMPLE_FIRST) == 50, len(_SAMPLE_FIRST)
assert len(set(_SAMPLE_FIRST)) == 50

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
