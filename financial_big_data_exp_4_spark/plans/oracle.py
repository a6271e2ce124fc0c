"""ANSI-SQL oracles for the declared reference queries.

Each string is runnable by DuckDB over the fixture tables registered as
views with their file names. The SQL mirrors the Spark plan's *semantics
and evaluation shape* — identical expression trees over identical inputs so
double arithmetic is bit-identical (SURVEY.md §7 determinism rules):

* double division / floor with the same operand order;
* float32 chains mirrored with REAL casts (q_interest);
* ``round_even`` for Spark's HALF_EVEN ``bround`` (SURVEY note D);
* total-order ORDER BY everywhere an order is declared.

Every declared reference query has an entry (zero rows-only checks):
``q_quantile_bucket`` mirrors the exact-percentile Bucketizer via
``quantile_cont`` + a left-closed split count; ``q_vector_assemble``
mirrors the assembled vector element-by-element as double casts.
"""

from financial_big_data_exp_4_spark.functions.core import det_hash_mod_sql
from financial_big_data_exp_4_spark.plans.reference import QUANTILE_PS

_QS_LIST = "[" + ", ".join(repr(p) for p in QUANTILE_PS) + "]"

REFERENCE_ORACLE_SQL: dict[str, str] = {
    "q_scan": "SELECT count(*) AS cnt FROM lineitem",
    "q_industry_count": """
        SELECT c_mktsegment, count(*) AS cnt
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY cnt DESC, c_mktsegment ASC
    """,
    "q_loan_histogram": """
        WITH edges AS (
            SELECT CAST(floor(o_totalprice / 1000) * 1000 AS BIGINT) AS left_edge
            FROM orders
        )
        SELECT
            '(' || CAST(left_edge AS VARCHAR) || ',' ||
            CAST(left_edge + 1000 AS VARCHAR) || ')' AS bucket,
            left_edge,
            count(*) AS cnt
        FROM edges
        GROUP BY left_edge
        ORDER BY left_edge
    """,
    "q_employer_share": """
        WITH counts AS (
            SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY o_orderpriority
        ), tot AS (
            SELECT count(*) AS total FROM orders
        )
        SELECT o_orderpriority,
               round_even(CAST(cnt AS DOUBLE) / total, 4) AS share
        FROM counts, tot
        ORDER BY share ASC, o_orderpriority ASC
    """,
    "q_interest": """
        SELECT l_orderkey, l_linenumber,
               CAST(
                   (CAST(l_extendedprice AS REAL) *
                    (CAST(1 AS REAL) - CAST(l_discount AS REAL))) * CAST(12 AS REAL)
                   - CAST(l_quantity AS REAL)
               AS DOUBLE) AS total_money
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
    """,
    "q_workyear_filter": """
        WITH wy AS (
            SELECT p_partkey,
                   CASE
                       WHEN p_partkey % 13 = 0 THEN NULL
                       WHEN p_size % 12 = 0 THEN '< 1 year'
                       WHEN p_size % 12 >= 10 THEN '10+ years'
                       WHEN p_size % 12 = 1 THEN '1 year'
                       ELSE CAST(p_size % 12 AS VARCHAR) || ' years'
                   END AS work_year
            FROM part
        ), parsed AS (
            SELECT p_partkey, work_year,
                   CAST(CASE
                       WHEN work_year IS NULL THEN -1
                       WHEN contains(work_year, '10+') THEN 11
                       WHEN contains(work_year, '<') THEN 0
                       ELSE CAST(str_split(work_year, ' ')[1] AS INTEGER)
                   END AS INTEGER) AS work_year_num
            FROM wy
        )
        SELECT * FROM parsed WHERE work_year_num > 5 ORDER BY p_partkey
    """,
    "q_project": """
        SELECT s_suppkey, s_name, s_acctbal FROM supplier ORDER BY s_suppkey
    """,
    "q_topk": """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        ORDER BY p_retailprice DESC, p_partkey ASC
        LIMIT 20
    """,
    "q_fillna": """
        SELECT event_id,
               COALESCE(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END, -1.0)
                   AS value_f,
               COALESCE(CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END, '-1')
                   AS etype_f
        FROM events
        ORDER BY event_id
    """,
    "q_random_split": f"""
        SELECT CASE WHEN {det_hash_mod_sql("o_orderkey", 100)} < 80
                    THEN 'train' ELSE 'test' END AS split,
               count(*) AS cnt
        FROM orders
        GROUP BY 1
        ORDER BY split
    """,
    # Bucketizer with splits [-inf, q_0.05..q_0.95, +inf] assigns x the
    # left-closed bucket [s_j, s_{j+1}) — i.e. the count of internal
    # splits <= x. quantile_cont == Spark's exact `percentile` (same
    # (n-1)*p linear interpolation). list_distinct mirrors the engine's
    # split dedupe (Bucketizer rejects duplicate splits; the engine
    # compresses colliding quantiles, so the oracle must count each
    # collided split once or bucket ids above the collision diverge).
    "q_quantile_bucket": f"""
        WITH q AS (
            SELECT quantile_cont(o_totalprice, {_QS_LIST}) AS qs FROM orders
        )
        SELECT CAST(len(list_filter(list_distinct(q.qs),
                                    s -> s <= o.o_totalprice)) AS INTEGER)
                   AS price_bucket,
               count(*) AS cnt
        FROM orders o, q
        GROUP BY 1
        ORDER BY price_bucket
    """,
    # COALESCE(-1.0) mirrors the engine's impute-before-assemble (NULL
    # aborts VectorAssembler's handleInvalid="error" default)
    "q_vector_assemble": """
        SELECT c_custkey,
               CAST(3 AS BIGINT) AS n_features,
               CAST(c_custkey AS DOUBLE) AS f_custkey,
               CAST(c_nationkey AS DOUBLE) AS f_nationkey,
               CAST(COALESCE(c_acctbal, -1.0) AS DOUBLE) AS f_acctbal
        FROM customer
        ORDER BY c_custkey
    """,
    # End-to-end feature chain: indexer codes via dense_rank (the
    # StringIndexer frequencyDesc contract), imputed acctbal, hash split —
    # all summed exactly, and every output column is an integer (acctbal
    # as BIGINT cents) so the hash is stable under any float canonicalizer.
    # Outer sums MUST be wrapped in CAST(... AS BIGINT): DuckDB returns
    # HUGEINT (int128) for any integer sum(), which some canonicalizers
    # render differently from int64 and the hash then mismatches.
    "q_feature_pipeline": f"""
        WITH freq AS (
            SELECT COALESCE(c_mktsegment, '-1') AS seg, count(*) AS cnt
            FROM customer GROUP BY 1
        ), codes AS (
            SELECT seg,
                   CAST(dense_rank() OVER (ORDER BY cnt DESC, seg ASC) - 1
                        AS DOUBLE) AS mkt_idx
            FROM freq
        ), feat AS (
            SELECT c.c_custkey,
                   COALESCE(CASE WHEN c.c_custkey % 11 = 0 THEN NULL
                                 ELSE CAST(c.c_acctbal AS DOUBLE) END,
                            -1.0) AS acctbal,
                   codes.mkt_idx
            FROM customer c
            JOIN codes ON COALESCE(c.c_mktsegment, '-1') = codes.seg
        )
        SELECT CASE WHEN {det_hash_mod_sql("c_custkey", 100)} < 80
                    THEN 'train' ELSE 'test' END AS split,
               count(*) AS cnt,
               CAST(sum(CAST(mkt_idx AS BIGINT)) AS BIGINT) AS sum_mkt_idx,
               CAST(sum(CAST(CAST(acctbal AS DECIMAL(38,2)) * 100 AS BIGINT))
                    AS BIGINT) AS sum_acctbal_cents
        FROM feat
        GROUP BY 1
        ORDER BY split
    """,
    # COALESCE(seg, '-1') mirrors the engine's impute-before-index (the
    # reference's na.fill('-1'); NULL would abort the indexer and fall
    # out of this equi-join)
    "q_string_index": """
        WITH freq AS (
            SELECT COALESCE(c_mktsegment, '-1') AS seg, count(*) AS cnt
            FROM customer GROUP BY 1
        ), codes AS (
            SELECT seg,
                   CAST(dense_rank() OVER (ORDER BY cnt DESC, seg ASC) - 1 AS DOUBLE)
                       AS mkt_idx
            FROM freq
        )
        SELECT c.c_custkey, COALESCE(c.c_mktsegment, '-1') AS c_mktsegment,
               codes.mkt_idx
        FROM customer c
        JOIN codes ON COALESCE(c.c_mktsegment, '-1') = codes.seg
        ORDER BY c.c_custkey
    """,
}
