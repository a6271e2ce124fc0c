"""Corpus-curation operator semantics on crafted inputs: quality rules,
repetition, TF-IDF, sequence packing, stratified sampling, inverted index."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_quality_filter_rules(spark):
    from financial_big_data_exp_4_spark.operators import quality_filter

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over dog"),  # passes all rules
            (1, "too few"),                             # < 5 words
            (2, "a b c d e f g"),                       # mean len 1 < 2
            (3, "#$% #$% the cat sat on the mat !!! ###"),  # symbol-heavy
            (4, "quick brown foxes jump over seven lazy dogs"),  # no stopword
            (5, ""),                                    # empty: 0 words
            (6, None),                                  # NULL text
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_filter(docs).collect()}
    assert rows[0]["keep"] is True
    assert rows[1]["keep"] is False and rows[1]["n_words"] == 2
    assert rows[2]["keep"] is False and rows[2]["mean_word_len"] == 1.0
    assert rows[3]["keep"] is False
    assert rows[3]["symbol_word_ratio"] > 0.3
    assert rows[4]["keep"] is False and rows[4]["has_stopword"] is False
    assert rows[5]["keep"] is False and rows[5]["n_words"] == 0
    assert rows[5]["mean_word_len"] == 0.0  # 0/0 guarded
    # NULL text must be an explicit, auditable reject — a NULL keep would
    # pass silently through both where(keep) and where(~keep)
    assert rows[6]["keep"] is False and rows[6]["n_words"] == 0
    assert rows[6]["has_stopword"] is False


def test_repetition_stats_modal_bigram(spark):
    from financial_big_data_exp_4_spark.operators import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "spam ham spam ham spam"),  # 'ham spam'x2, 'spam ham'x2 tie
            (1, "all words differ here"),
            (2, "one"),                     # no bigrams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # 5 tokens, 2 distinct → dup fraction 3/5
    assert rows[0]["dup_word_frac"] == 0.6
    # tie on count=2 broken lexicographically: 'ham spam' < 'spam ham'
    assert rows[0]["top_bigram"] == "ham spam"
    assert rows[0]["top_bigram_n"] == 2
    assert rows[0]["top_bigram_frac"] == 0.5  # 2 of 4 bigrams
    assert rows[1]["dup_word_frac"] == 0.0
    assert rows[1]["top_bigram_n"] == 1
    assert rows[2]["top_bigram"] == "" and rows[2]["top_bigram_n"] == 0
    assert rows[2]["top_bigram_frac"] == 0.0


def test_tfidf_ranks_distinctive_terms(spark):
    from financial_big_data_exp_4_spark.operators import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (0, "common rare rare rare"),
            (1, "common other"),
            (2, "common thing"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2).collect()
    assert [r["term"] for r in out] == ["rare", "common"]
    rare = out[0]
    # tf=3, df=1, N=3 → 3 * 3 / 1 = 9
    assert rare["tf"] == 3 and rare["df"] == 1 and rare["tfidf"] == 9.0


def test_pack_sequences_budget_respected(spark):
    from financial_big_data_exp_4_spark.operators import pack_sequences

    # 6 docs x 3 tokens, budget 5, chunk 1000 → bins of cum tokens:
    # cum 3,6,9,12,15,18 → bins (cum-1)//5 = 0,1,1,2,2,3
    docs = spark.createDataFrame(
        [(i, "tok tok tok") for i in range(6)],
        "doc_id long, text string",
    )
    out = {
        (r["chunk"], r["bin"]): r
        for r in pack_sequences(docs, budget=5, chunk=1000).collect()
    }
    assert out[(0, 0)]["n_docs"] == 1 and out[(0, 0)]["n_tokens"] == 3
    assert out[(0, 1)]["n_docs"] == 2 and out[(0, 1)]["n_tokens"] == 6
    assert out[(0, 3)]["n_docs"] == 1
    # chunk-locality: doc_ids in different chunks never share a window
    out2 = pack_sequences(docs, budget=5, chunk=3).collect()
    assert {r["chunk"] for r in out2} == {0, 1}


def test_stratified_sample_deterministic_and_bounded(spark, sf_dir):
    from financial_big_data_exp_4_spark.operators import stratified_sample
    from financial_big_data_exp_4_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    rates = {"error": 1000, "purchase": 500, "view": 0}
    out = stratified_sample(
        events, key="event_id", stratum="event_type", rates_permille=rates
    )
    counts = {
        r["event_type"]: r["n"]
        for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert counts["error"] == totals["error"]       # rate 1000 keeps all
    assert "view" not in counts                      # rate 0 drops all
    assert "click" not in counts                     # unlisted stratum drops
    assert 0 < counts["purchase"] < totals["purchase"]
    # deterministic: same rows on a re-run over a different layout
    a = sorted(r["event_id"] for r in out.collect())
    b = sorted(
        r["event_id"]
        for r in stratified_sample(
            events.repartition(7),
            key="event_id",
            stratum="event_type",
            rates_permille=rates,
        ).collect()
    )
    assert a == b


def test_inverted_index_bounded_postings(spark):
    from financial_big_data_exp_4_spark.operators import inverted_index

    docs = spark.createDataFrame(
        [(i, "shared unique%d" % i) for i in range(10)],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in inverted_index(docs, max_postings=4).collect()}
    shared = out["shared"]
    assert shared["n_docs"] == 10  # full df survives the truncation
    assert shared["postings"] == "0,1,2,3"  # first 4 ids, ascending
    assert out["unique3"]["postings"] == "3"
    # per-term state is bounded even for the hottest term
    assert all(len(r["postings"].split(",")) <= 4 for r in out.values())


def test_lineitem_pricing_decimal_exactness(spark, sf_dir):
    """The decimal-routed sums must equal DuckDB's decimal arithmetic on
    the same rows — order-independence is the point of the routing."""
    import duckdb

    from financial_big_data_exp_4_spark.plans.extensions import (
        q_lineitem_pricing,
    )

    got = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in q_lineitem_pricing(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    from financial_big_data_exp_4_spark.plans.oracle_ext import (
        EXTENSION_ORACLE_SQL,
    )

    res = con.execute(EXTENSION_ORACLE_SQL["q_lineitem_pricing"])
    cols = [d[0] for d in res.description]
    for row in res.fetchall():
        d = dict(zip(cols, row))
        g = got[(d["l_returnflag"], d["l_linestatus"])]
        for c in cols:
            assert g[c] == d[c], (c, g[c], d[c])


def test_group_median_center_semantics(spark):
    from financial_big_data_exp_4_spark.operators.grouped import (
        group_median_center,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 1.0), (2, "a", 3.0), (3, "a", 10.0),   # odd n: med 3
            (4, "b", 2.0), (5, "b", 4.0),                    # even n: med 3
            (6, "b", None),                                  # dropped
        ],
        "event_id long, event_type string, value double",
    )
    rows = {
        r["event_id"]: r
        for r in group_median_center(
            df, key="event_type", value="value"
        ).collect()
    }
    assert len(rows) == 5  # null row dropped
    assert rows[1]["centered_value"] == -2.0
    assert rows[2]["centered_value"] == 0.0
    assert rows[3]["centered_value"] == 7.0
    assert rows[4]["centered_value"] == -1.0   # (2+4)/2 interpolated
    assert rows[5]["centered_value"] == 1.0


def test_scrub_pii_redacts_and_counts(spark):
    from financial_big_data_exp_4_spark.operators import scrub_pii

    docs = spark.createDataFrame(
        [
            (0, "mail me at Jo.Doe+x@Example.org or call 555-123-4567 now"),
            (1, "no pii here"),
            (2, "a@b.io c@d.net 111.222.3333"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert rows[0]["clean_text"] == "mail me at [EMAIL] or call [PHONE] now"
    assert rows[0]["n_emails"] == 1 and rows[0]["n_phones"] == 1
    assert rows[1]["clean_text"] == "no pii here"
    assert rows[1]["n_emails"] == 0 and rows[1]["n_phones"] == 0
    assert rows[2]["clean_text"] == "[EMAIL] [EMAIL] [PHONE]"


def test_scrub_pii_phone_inside_email_not_double_counted(spark):
    """A phone-shaped substring consumed by the email pass never becomes
    a [PHONE] token, so the audit counts must not claim it: counts follow
    the sequential replacement, not the original text."""
    from financial_big_data_exp_4_spark.operators import scrub_pii

    docs = spark.createDataFrame(
        [(0, "contact 555-123-4567@corp.com please")],
        "doc_id long, text string",
    )
    [r] = scrub_pii(docs).collect()
    assert r["clean_text"] == "contact [EMAIL] please"
    assert r["n_emails"] == 1
    assert r["n_phones"] == 0  # consumed by the email pass — not redacted


def test_apply_exact_dedup_keeps_min_id_rows(spark):
    from financial_big_data_exp_4_spark.operators import apply_exact_dedup

    docs = spark.createDataFrame(
        [
            (5, "same text", "en", 9),
            (1, "same text", "en", 9),
            (3, "other", "de", 5),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    got = sorted(map(tuple, apply_exact_dedup(docs).collect()))
    assert got == [(1, "en", 9), (3, "de", 5)]


def test_moving_avg_frame_semantics(spark):
    from financial_big_data_exp_4_spark.operators import moving_value_avg

    ns = 1_000_000_000
    events = spark.createDataFrame(
        [
            (1, 7, 1 * ns, 2.0),
            (2, 7, 2 * ns, 4.0),
            (3, 7, 3 * ns, 6.0),
            (4, 7, 4 * ns, 8.0),
            (5, 9, 1 * ns, 10.0),
        ],
        "event_id long, user_id long, ts long, value double",
    )
    rows = {r["event_id"]: r for r in moving_value_avg(events, n=3).collect()}
    assert rows[1]["mov_avg"] == 2.0           # frame: [2]
    assert rows[2]["mov_avg"] == 3.0           # [2,4]
    assert rows[3]["mov_avg"] == 4.0           # [2,4,6]
    assert rows[4]["mov_avg"] == 6.0           # [4,6,8] — 2.0 left the frame
    assert rows[4]["mov_sum"] == 18.0
    assert rows[5]["mov_avg"] == 10.0          # other user: own frame


def test_corpus_ops_on_empty_input(spark):
    """Every corpus operator must be total: an empty corpus yields an
    empty, correctly-typed result, never an error (at scale, empty
    partitions and empty filtered subsets are routine)."""
    from financial_big_data_exp_4_spark.operators import (
        inverted_index,
        pack_sequences,
        quality_filter,
        repetition_stats,
        tfidf_top_terms,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    for op in (
        quality_filter,
        repetition_stats,
        tfidf_top_terms,
        pack_sequences,
        inverted_index,
    ):
        out = op(empty)
        assert out.count() == 0, op.__name__
        assert out.schema is not None


def test_observation_metrics_ride_the_quality_pass(spark, sf_dir):
    """`Observation` collects pipeline metrics (row counts, kept counts)
    as a side channel of the SAME action — no second pass over the data,
    which is how a curation pipeline reports yield at 100 TB without
    re-scanning."""
    from pyspark.sql import Observation

    from financial_big_data_exp_4_spark.operators import quality_filter
    from financial_big_data_exp_4_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    obs = Observation("quality_pass")
    observed = quality_filter(docs).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
    )
    n = observed.count()
    got = obs.get
    assert got["n_rows"] == n
    assert 0 < got["n_kept"] <= n


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    """Packing must conserve mass: every document lands in exactly one
    bin, so per-bin token/doc counts sum to the corpus totals."""
    from pyspark.sql import functions as F

    from financial_big_data_exp_4_spark.operators import pack_sequences
    from financial_big_data_exp_4_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs)
    agg = packed.agg(
        F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    n_docs = docs.count()
    n_tokens = docs.select(
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0
            )
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert agg["d"] == n_docs
    assert agg["t"] == n_tokens


def test_oracle_decimal_to_double_routes_via_varchar():
    """DuckDB's direct decimal→double conversion double-rounds on
    >15-digit decimals (6634783729228.8365 → ...837; correctly rounded
    is ...836, which Spark produces); its string→double parse is
    correctly rounded. Every oracle DECIMAL sum must therefore convert
    via VARCHAR — this pins both the DuckDB behavior and the rule."""
    import decimal

    import duckdb

    con = duckdb.connect()
    [(direct, via, s)] = con.execute(
        "SELECT CAST(CAST('6634783729228.8365' AS DECIMAL(20,4)) AS DOUBLE),"
        "       CAST(CAST(CAST('6634783729228.8365' AS DECIMAL(20,4))"
        "            AS VARCHAR) AS DOUBLE),"
        "       CAST(CAST('6634783729228.8365' AS DECIMAL(20,4)) AS VARCHAR)"
    ).fetchall()
    correctly_rounded = float(decimal.Decimal(s))
    assert via == correctly_rounded
    if direct == correctly_rounded:  # a fixed DuckDB would relax the rule
        return
    # the rule itself: no bare sum(...)→DOUBLE cast left in any oracle.
    # Paren-AWARE scan, not a fixed-nesting regex: the dominant offender
    # shapes are 2+ levels deep (CAST(sum(CAST(x AS DECIMAL(38,2))) AS
    # DOUBLE)) and window forms (CAST(sum(..) OVER w AS DOUBLE)), which
    # a one-level regex silently misses.
    from financial_big_data_exp_4_spark.plans import REFERENCE_ORACLE_SQL

    def has_bare_sum_double_cast(sql: str) -> bool:
        i = 0
        while True:
            j = sql.find("CAST(sum(", i)
            if j < 0:
                return False
            k = j + len("CAST(")
            depth = 1
            while k < len(sql):
                c = sql[k]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break  # CAST closed some other way (e.g. BIGINT)
                if depth == 1 and sql.startswith("AS DOUBLE)", k):
                    return True
                k += 1
            i = k + 1

    offenders = {
        name
        for name, sql in REFERENCE_ORACLE_SQL.items()
        if has_bare_sum_double_cast(sql)
    }
    assert not offenders, offenders
    # self-check: the scanner DOES catch the shapes the old regex missed
    assert has_bare_sum_double_cast(
        "CAST(sum(CAST(x AS DECIMAL(38,2))) AS DOUBLE)"
    )
    assert has_bare_sum_double_cast("CAST(sum(v) OVER w AS DOUBLE)")
    assert not has_bare_sum_double_cast(
        "CAST(CAST(sum(v) AS VARCHAR) AS DOUBLE)"
    )


def test_lm_bigram_scores_match_hand_model(spark):
    from financial_big_data_exp_4_spark.operators.corpus import (
        lm_bigram_scores,
    )

    docs = spark.createDataFrame(
        # doc 6 tokenizes to the EMPTY array (all symbols): slice() with
        # a negative length raises, so it pins the greatest(...,0) guard
        [(1, "a b"), (2, "a c"), (3, "a b c"), (4, "solo"), (5, None),
         (6, "!!! ???")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in lm_bigram_scores(docs).collect()}
    # corpus bigrams: (a,b)x2 (a,c)x1 (b,c)x1; contexts: a->3, b->1
    # doc1: P(b|a)=2/3;  doc2: P(c|a)=1/3;  doc3: mean(2/3, 1/1) = 5/6
    assert set(rows) == {1, 2, 3}  # <2 tokens / NULL text -> no row
    assert rows[1].n_bigrams == 1 and abs(rows[1].lm_prob - 2 / 3) < 1e-9
    assert rows[2].n_bigrams == 1 and abs(rows[2].lm_prob - 1 / 3) < 1e-9
    assert rows[3].n_bigrams == 2 and abs(rows[3].lm_prob - 5 / 6) < 1e-9
