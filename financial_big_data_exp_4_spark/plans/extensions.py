"""Declared extension queries (SURVEY §2.8 / BASELINE north star): the
LLM-data-pipeline surface over ``documents`` / ``embeddings`` / ``events``
plus the star-schema join surface.

Same contract as :mod:`.reference`: ``(spark, sf_dir) → DataFrame``, column
names aliased identically to the DuckDB oracles in :mod:`.oracle_ext`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from financial_big_data_exp_4_spark.operators import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    customers_without_orders,
    doc_fingerprint,
    embedding_neardup_pairs,
    exact_dedup,
    json_extract_stats,
    language_id,
    minhash_candidate_pairs,
    multimodal_metadata,
    ngram_jaccard_adjacent,
    revenue_by_region,
    sessionize,
    simhash_docs,
    text_quality,
    token_counts,
    tumbling_counts,
)
from financial_big_data_exp_4_spark.sources import load_table


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


def q_neardup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_candidate_pairs(load_table(spark, sf_dir, "documents"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_docs(load_table(spark, sf_dir, "documents"))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_adjacent(load_table(spark, sf_dir, "documents"))


def q_embed_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk_bruteforce(load_table(spark, sf_dir, "embeddings"))


def q_embed_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk_ivf(load_table(spark, sf_dir, "embeddings"))


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_neardup_pairs(load_table(spark, sf_dir, "embeddings"))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(load_table(spark, sf_dir, "documents"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_quality(load_table(spark, sf_dir, "documents"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load_table(spark, sf_dir, "documents"))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(load_table(spark, sf_dir, "documents"))


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"))


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return json_extract_stats(load_table(spark, sf_dir, "events"))


def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revenue_by_region(spark, sf_dir)


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return customers_without_orders(spark, sf_dir)


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal_metadata(load_table(spark, sf_dir, "documents"))


EXTENSION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_dedup_exact": q_dedup_exact,
    "q_neardup_minhash": q_neardup_minhash,
    "q_dedup_simhash": q_dedup_simhash,
    "q_ngram_jaccard": q_ngram_jaccard,
    "q_embed_cosine_topk": q_embed_cosine_topk,
    "q_embed_ann_ivf": q_embed_ann_ivf,
    "q_embed_neardup": q_embed_neardup,
    "q_token_count": q_token_count,
    "q_text_quality": q_text_quality,
    "q_lang_id": q_lang_id,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_tumbling_window": q_tumbling_window,
    "q_sessionize": q_sessionize,
    "q_json_extract": q_json_extract,
    "q_star_join": q_star_join,
    "q_anti_join": q_anti_join,
    "q_multimodal_meta": q_multimodal_meta,
}
