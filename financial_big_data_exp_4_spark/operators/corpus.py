"""Corpus-curation operators for LLM training-data pipelines: rule-based
quality filtering, repetition detection, TF-IDF term statistics, sequence
packing, stratified sampling, and inverted-index construction (BASELINE
north star — no counterpart in the reference, whose workload is
single-table relational).

100 TB design notes
-------------------
* **Quality filter** and **repetition word-stats** are map-only expression
  trees — per-row featurization at parquet-scan speed inside whole-stage
  codegen, the standard first pass over a raw crawl.
* **Repetition bigram stats** and **TF-IDF** explode tokens and aggregate;
  both rely on map-side partial aggregation so the shuffle carries
  (key, partial-count) pairs, not raw token rows. The TF-IDF corpus size
  N joins in as a broadcast of a 1-row aggregate — never a driver-side
  ``collect``.
* **Sequence packing** is *chunk-local*: documents are windowed inside
  fixed ``doc_id``-range chunks, so the running-total sort parallelizes
  per chunk instead of forcing a single global sort — the property that
  keeps packing feasible at 100 TB (a global greedy pack is inherently
  sequential; chunk-local packing wastes at most one partial bin per
  chunk, negligible for chunk ≫ budget).
* **Stratified sampling** is map-only and deterministic across engines,
  runs, and partition layouts (same multiplicative integer hash as
  :func:`.relational.hash_sample`) — per-stratum rates are a literal map,
  no per-group pass, no ``rand()``.
* **Inverted index** bounds per-term state *before* aggregating: a
  windowed ``row_number`` keeps only the first ``max_postings`` doc ids
  per term, so ``collect_list`` state is O(max_postings), never O(docs) —
  the unbounded collect would OOM a reducer on a stopword term at scale.
  The window and the final groupBy share the ``term`` partitioning, so
  the plan has exactly one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from financial_big_data_exp_4_spark.operators.dedup import tokenize
from financial_big_data_exp_4_spark.operators.text import QUALITY_STOPWORDS

#: Gopher-style quality-rule bounds (Rae et al. 2021, table A1 shape —
#: the *rule set* is the operator; the thresholds are tunable knobs).
QF_MIN_WORDS = 5
QF_MAX_WORDS = 1000
QF_MIN_MEAN_LEN = 2.0
QF_MAX_MEAN_LEN = 12.0
QF_MAX_SYMBOL_RATIO = 0.3

#: Sequence-packing defaults: token budget per packed sequence and the
#: doc_id-range chunk width that bounds each packing window.
PACK_BUDGET = 512
PACK_CHUNK = 256

#: Inverted-index posting-list bound (per-term state cap).
INDEX_MAX_POSTINGS = 32

#: Per-stratum sampling rates (per-mille) for the events table: keep all
#: errors, half the purchases, progressively less of the high-volume
#: low-signal strata — the canonical shape of a curation sample.
EVENT_SAMPLE_RATES: dict[str, int] = {
    "error": 1000,
    "purchase": 500,
    "signup": 250,
    "view": 100,
    "click": 50,
}

#: TF-IDF output size.
TFIDF_TOP_K = 20

#: Chunking defaults: window width and overlap in characters (step =
#: width − overlap). Character-based here; a token-based chunker swaps the
#: ``substr`` for an array slice over the token array, same plan shape.
CHUNK_WIDTH = 120
CHUNK_OVERLAP = 30

#: BM25 defaults (Robertson-Spärck Jones): saturation and length norm.
BM25_K1 = 1.5
BM25_B = 0.75
#: Fixed query-term set for the declared query (present in the fixture
#: vocabulary); the operator takes any term tuple.
BM25_QUERY_TERMS: tuple[str, ...] = ("join", "hash", "window", "spark")
BM25_TOP_K = 10


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style rule-based quality filter — map-only.

    Rules (all inclusive bounds): word count in [5, 1000], mean word
    length in [2, 12], symbol-to-word ratio ≤ 0.3, and at least one
    English stopword present. Emits the per-rule features plus the
    composite ``keep`` flag, so downstream can audit *why* a document was
    dropped (the operational requirement for curation pipelines).

    ``tok_chars`` is computed as ``length(regexp_replace(...))`` — the
    count of ``[a-z0-9]`` chars equals the summed token lengths under the
    ``[a-z0-9]+`` tokenizer, without materializing the token array.

    ``keep_cols`` pass through untouched, so downstream aggregates (e.g.
    per-source yield) compose in the SAME scan instead of joining the
    filter output back to the table — one pass, no shuffle on doc_id.
    """
    from financial_big_data_exp_4_spark.session import rebalance_for_cpu

    # single-row-group guard: three regex passes + the stopword
    # intersection are the map cost; roughly neutral at 50k docs (regex
    # task overhead ≈ compute) but the single-task path grows linearly
    # with the corpus while this stays flat — and it is a no-op on a
    # real multi-split scan
    docs = rebalance_for_cpu(docs, id_col)
    t = F.col(text_col)
    # NULL text tokenizes to the EMPTY array, not NULL: unguarded, every
    # feature and the composite keep would come out NULL, and a NULL keep
    # passes silently through both where(keep) and where(~keep) — the
    # junk row vanishes from the audit trail. Empty-token docs fail the
    # word-count rule, so NULL text is an explicit, auditable reject.
    base = docs.select(
        *keep_cols,
        F.col(id_col).alias("doc_id"),
        t.alias("_t"),
        tokenize(F.coalesce(t, F.lit(""))).alias("_toks"),
        F.length(F.regexp_replace(F.lower(t), "[^a-z0-9]", "")).alias(
            "_tok_chars"
        ),
    )
    n_words = F.size(F.col("_toks"))
    # symbol count as length-after-delete, NOT size(regexp_extract_all):
    # a single-char class match consumes one code point either way, so
    # deleting the complement class and measuring length counts the
    # exact same characters — but extract_all materializes one string
    # per match and on symbol-dense text its per-match cost dominated
    # the whole operator (measured at the 10× fixture: 3.29 s for the
    # extract_all projection alone vs 0.35 s for this form — r15;
    # regexp_count measured 3.52 s, same per-match iteration cost)
    n_sym = F.length(F.regexp_replace(F.col("_t"), r"[a-zA-Z0-9\s]", ""))
    mean_len = F.when(
        n_words > 0,
        F.col("_tok_chars").cast("double") / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    sym_ratio = F.when(
        n_words > 0, n_sym.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    has_stop = F.arrays_overlap(F.col("_toks"), stop_arr)
    # two projections, keep derived from the FEATURE COLUMNS (r15): an
    # authored single-select spelled every feature expression out twice
    # (once as the output column, once inside the composite keep), and
    # the regexp/overlap features are not cheap — the planner keeps the
    # stage boundary here because the features are non-trivial and
    # multiply referenced, so each evaluates ONCE (plan: 1
    # arrays_overlap, 2 regexp_replace; measured 2.97 s → 2.24 s warm
    # at the 10× fixture, rows identical).
    feats = base.select(
        *keep_cols,
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        has_stop.alias("has_stopword"),
    )
    keep = (
        (F.col("n_words") >= QF_MIN_WORDS)
        & (F.col("n_words") <= QF_MAX_WORDS)
        & (F.col("mean_word_len") >= QF_MIN_MEAN_LEN)
        & (F.col("mean_word_len") <= QF_MAX_MEAN_LEN)
        & (F.col("symbol_word_ratio") <= QF_MAX_SYMBOL_RATIO)
        & F.col("has_stopword")
    )
    return feats.select(
        *keep_cols,
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_word_ratio",
        "has_stopword",
        keep.alias("keep"),
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition signals per document: duplicate-word fraction and the
    share of the most frequent word bigram (the Gopher "repetition"
    family, adapted to newline-free documents).

    The word-level part is map-only. The bigram part explodes bigrams and
    aggregates (doc_id, bigram) with map-side partial counts, then a
    per-doc window picks the modal bigram (ties broken lexicographically
    — deterministic). Docs with < 2 tokens get ('' , 0, 0.0) via the
    left join's coalesce.
    """
    t = F.col(text_col)
    # materialize the token array once (SPARK-36718: an inlined alias
    # would re-run the tokenize regex per downstream reference), and
    # persist it: the word-stats branch and the exploded-bigram branch
    # both read base, and Spark shares no scans between join branches —
    # unpersisted, the docs scan + rebalance shuffle + tokenize regex all
    # run twice per invocation (same hazard bm25_scores documents)
    from financial_big_data_exp_4_spark.session import (
        persist_scoped,
        rebalance_for_cpu,
    )

    base = persist_scoped(
        rebalance_for_cpu(docs, id_col)
        .select(F.col(id_col).alias("doc_id"), tokenize(t).alias("_toks"))
        .withColumn("_n", F.size(F.col("_toks")))
    )
    # word stats (map-only)
    n = F.col("_n")
    nd = F.size(F.array_distinct(F.col("_toks")))
    words = base.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.when(
            n > 0, (n - nd).cast("double") / n.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
    )
    # bigram mode: all (non-distinct) adjacent bigrams
    toks = F.col("_toks")
    grams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = base.select("doc_id", F.explode(grams).alias("bigram"))
    counts = exploded.groupBy("doc_id", "bigram").agg(
        F.count("*").alias("cnt")
    )
    # modal bigram as a partial-aggregating argmax — min(struct(-cnt,
    # bigram)) = highest count, ties to the lexicographically smallest
    # bigram — instead of a row_number window: the aggregate combines
    # map-side and reuses the (doc_id, bigram) clustering, where a
    # window would add a full per-doc SORT of every bigram count.
    top = (
        counts.groupBy("doc_id")
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("_negcnt"), F.col("bigram"))
            ).alias("_top"),
            F.sum("cnt").alias("_total"),
        )
        .select(
            "doc_id",
            F.col("_top.bigram").alias("top_bigram"),
            (-F.col("_top._negcnt")).alias("top_bigram_n"),
            (
                (-F.col("_top._negcnt")).cast("double")
                / F.col("_total").cast("double")
            ).alias("top_bigram_frac"),
        )
    )
    return words.join(top, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "dup_word_frac",
        F.coalesce(F.col("top_bigram"), F.lit("")).alias("top_bigram"),
        F.coalesce(F.col("top_bigram_n"), F.lit(0)).cast("long").alias(
            "top_bigram_n"
        ),
        F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)).alias(
            "top_bigram_frac"
        ),
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = TFIDF_TOP_K,
) -> DataFrame:
    """Global top-``k`` terms by TF-IDF over the corpus.

    tf = total occurrences, df = documents containing the term,
    score = tf · (N / df) — the *linear* idf variant: ``ln`` is avoided
    deliberately because IEEE +·−·×·÷ are exactly rounded (bit-identical
    across engines) while transcendental functions are not; production
    swaps ``N/df`` for ``ln(N/df)`` without touching the plan shape.

    One explode + one hash aggregate (tf and df in the same pass —
    Spark plans the distinct count as an expand with partial aggregation);
    N broadcasts as a 1-row aggregate; top-k plans as
    TakeOrderedAndProject.
    """
    # CPU rebalance REINSTATED (round 12): the earlier "no rebalance"
    # A/B (0.42s → 0.69s at sf0.1) was measured when the fan-out
    # exchange ran at a fixed 32-way DOP; under the input-sized DOP the
    # same A/B flipped at BOTH scales (sf0.1: 0.79 → 0.59 s; the 10×
    # fixture: 6.4 → 1.1 s — a single-row-group file otherwise runs the
    # ~25M-row explode + countDistinct Expand partial-aggregate on ONE
    # task). The explode's 500× row fan-out is exactly the serialized
    # map stage rebalance_for_cpu exists for.
    from financial_big_data_exp_4_spark.session import rebalance_for_cpu

    docs = rebalance_for_cpu(docs, id_col)
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    stats = terms.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    n_docs = docs.agg(F.count("*").alias("_n"))
    score = (
        F.col("tf").cast("double")
        * F.col("_n").cast("double")
        / F.col("df").cast("double")
    )
    return (
        stats.crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            score.alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), F.asc("term"))
        .limit(k)
    )


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = PACK_BUDGET,
    chunk: int = PACK_CHUNK,
) -> DataFrame:
    """Greedy sequence packing: assign documents (in ``doc_id`` order) to
    fixed-token-budget bins, summarized per bin.

    Token counts use the BPE-ish tokenizer (word runs + single
    punctuation — the same regex as :func:`.text.token_counts`). The
    running total is windowed *within doc_id-range chunks* of
    ``chunk`` documents, so the sort distributes (see module notes); a
    document straddling a budget boundary lands in the bin its last
    token falls in. Output: one row per (chunk, bin) with doc and token
    counts.
    """
    from financial_big_data_exp_4_spark.operators.text import BPE_TOKEN_RE
    from financial_big_data_exp_4_spark.session import rebalance_for_cpu

    # single-row-group guard: the BPE tokenize regex is the map cost and
    # would otherwise run on the one scan task (measured 1.14s → 0.89s
    # at 50k docs, r9); the chunk window right after re-partitions anyway
    docs = rebalance_for_cpu(docs, id_col)
    t = F.col(text_col)
    # regexp_count: same matches as size(regexp_extract_all) without
    # materializing a string per token (measured 0.77 -> 0.69 s at 10x)
    n_tok = F.regexp_count(F.lower(t), F.lit(BPE_TOKEN_RE))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"{id_col} DIV {chunk}").alias("chunk"),
        n_tok.cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("chunk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = base.select(
        "chunk", "n_tok", F.sum("n_tok").over(w).alias("_cum")
    ).select(
        "chunk",
        "n_tok",
        F.expr(f"(greatest(_cum, 1) - 1) DIV {budget}").alias("bin"),
    )
    return packed.groupBy("chunk", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )


def lm_bigram_scores(docs: DataFrame) -> DataFrame:
    """CCNet-style corpus language-model scoring: train a bigram model
    ON the corpus (maximum-likelihood: P(w2|w1) = c(w1,w2)/c(w1·)) and
    score each document by its mean bigram probability — the standard
    "does this document read like the corpus" quality signal that LM
    perplexity filters approximate (Wenzek et al. 2020, CCNet; public
    method). Higher = more typical text; boilerplate scores high,
    lorem-gibberish low.

    Probabilities, not log-probabilities, ON PURPOSE: ln() is libm-
    dependent in its last ulp, so a log-based score could not hash
    bit-for-bit against the SQL oracle, while c2/c1 is one correctly-
    rounded IEEE division and the per-doc mean routes through a
    DECIMAL(18,12) sum (associative — a double sum's low bits depend on
    reduction order). A double → DECIMAL(18,12) cast cannot tie-break
    differently across engines: a tie needs the double to be exactly
    k·10⁻¹² + 5·10⁻¹³, which is not a binary fraction.

    Plan shape (100 TB): bigrams = map-side slice+zip+explode (~one row
    per token); the two count tables are partial-aggregable grouped
    counts; the probability join hash-partitions on the bigram/context
    keys (uniform in practice — token frequencies are zipfian but the
    JOIN key cardinality is bounded by distinct bigrams, and AQE
    skew-splits the hot-word partitions). Docs with fewer than two
    tokens have no bigrams and no row — the declared contract.

    Output: (doc_id, n_bigrams, lm_prob)."""
    from financial_big_data_exp_4_spark.session import rebalance_for_cpu

    base = rebalance_for_cpu(docs, "doc_id").select(
        "doc_id", tokenize("text").alias("_tk")
    )
    pairs = base.select(
        "doc_id",
        # greatest(…, 0): slice() RAISES on a negative length, and an
        # all-symbol document tokenizes to the EMPTY array (size 0 →
        # length −1) — found by the ns-encoding fuzz profile on its
        # first run over this operator
        F.explode(
            F.arrays_zip(
                F.expr(
                    "slice(_tk, 1, greatest(size(_tk) - 1, 0))"
                ).alias("w1"),
                F.expr(
                    "slice(_tk, 2, greatest(size(_tk) - 1, 0))"
                ).alias("w2"),
            )
        ).alias("_bg"),
    ).select(
        "doc_id",
        F.col("_bg.w1").alias("w1"),
        F.col("_bg.w2").alias("w2"),
    )
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_n2"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("_n1"))
    scored = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .select(
            "doc_id",
            (F.col("_n2").cast("double") / F.col("_n1")).alias("_p"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(F.col("_p").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("lm_prob"),
    )


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates_permille: dict[str, int]
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff its integer-key
    hash bucket (0-999) falls under the stratum's per-mille rate.

    Map-only (the CASE over strata folds into the scan filter) and
    layout/run/engine-independent — the property ``rand()``-based
    ``sampleBy`` cannot give. Strata absent from ``rates_permille``
    are dropped (rate 0).
    """
    from financial_big_data_exp_4_spark.functions.core import det_hash_mod

    # sign-safe bucket (pmod inside det_hash_mod): plain % yields
    # negative buckets for negative keys, which pass `bucket < rate`
    # even for rate-0 strata
    bucket = det_hash_mod(key, 1000)
    rate = F.lit(0)
    for s, r in sorted(rates_permille.items()):
        rate = F.when(F.col(stratum) == s, F.lit(r)).otherwise(rate)
    return df.where(bucket < rate)


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = CHUNK_WIDTH,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Split documents into overlapping fixed-width character chunks —
    the context-window preparation step of an embedding/RAG pipeline.

    Chunk starts are ``1, 1+step, …`` while ``start ≤ max(len−overlap,
    1)`` (step = width − overlap), so consecutive chunks share
    ``overlap`` characters, every character is covered, and no chunk
    starts inside the final overlap (which would emit a redundant
    tail ⊂ the previous chunk). Map-only row expansion:
    ``sequence``+``explode`` inside whole-stage codegen, no Python, and
    no shuffle beyond the single-row-group CPU rebalance below (a no-op
    at real split counts) — the output is immediately
    partition-parallel for the downstream embedder. Emits the md5 of
    each chunk (the id a
    chunk-level exact-dedup keys on) rather than the chunk text, keeping
    the declared output narrow; production would carry the text.
    """
    from financial_big_data_exp_4_spark.session import rebalance_for_cpu

    # single-row-group guard: substring+md5 per chunk is the map cost
    # (measured 0.82s → 0.32s at 50k docs, r9); no-op at real split counts
    docs = rebalance_for_cpu(docs, id_col)
    step = width - overlap
    t = F.col(text_col)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(t) - F.lit(overlap), F.lit(1)),
        F.lit(step),
    )
    chunk = F.substring(F.col("_t"), F.col("start"), width)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), t.alias("_t"),
            F.explode(starts).alias("start"),
        )
        .select(
            "doc_id",
            F.expr(f"CAST((start - 1) DIV {step} AS BIGINT)").alias(
                "chunk_idx"
            ),
            F.col("start").cast("long").alias("start"),
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...] = BM25_QUERY_TERMS,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = BM25_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-term BM25 ranking: the top-``k`` documents for each query term.

    ``score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` with the
    *linear* idf ``(N − df + 0.5)/(df + 0.5)`` — ``ln``-free for the same
    bit-portability reason as :func:`tfidf_top_terms` (transcendentals
    are not exactly rounded across libms; +·−·×·÷ are). ``ln`` drops in
    without touching the plan.

    Plan shape: one scan computes doc length and explodes only matching
    terms (the ``isin`` filter sits under the explode-aggregate, so
    non-query terms never reach the shuffle); ``dl`` rides the tf
    aggregate as ``min`` (constant per doc) — no doc-keyed join back.
    df-per-term and the (N, avgdl) corpus stats are broadcast 1-row/tiny
    aggregates. Scores are per (doc, term) — summing across terms would
    add doubles in engine-defined order; ranking is per term, so no
    cross-term float sum exists. Ties rank by doc_id asc (total order).

    The tokenized base is persisted (scoped): the corpus-stats branch,
    the df branch, and the scoring branch otherwise each re-run the
    tokenizer over the full corpus (Spark shares no scans between plan
    branches) — measured 1.11s → ~0.6s at sf0.1. At 100 TB the same
    slot is a checkpoint of the tokenized projection.
    """
    from financial_big_data_exp_4_spark.session import (
        persist_scoped,
        rebalance_for_cpu,
    )

    t = F.col(text_col)
    # fan the tokenizer across cores before persisting — the single-file
    # fixture scan is one row group = one task (no-op at real splits)
    base = persist_scoped(
        rebalance_for_cpu(docs, id_col).select(
            F.col(id_col).alias("doc_id"), tokenize(t).alias("_toks")
        )
    )
    hits = base.select(
        "doc_id",
        F.size("_toks").cast("long").alias("_dl"),
        F.explode("_toks").alias("term"),
    ).where(F.col("term").isin(*terms))
    tf = hits.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.min("_dl").alias("dl")
    )
    df_per_term = tf.groupBy("term").agg(F.count("*").alias("df"))
    corpus = base.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("_toks").cast("long")).alias("_sum_dl"),
    )
    idf = (
        F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    avgdl = F.col("_sum_dl").cast("double") / F.col("n_docs").cast("double")
    tf_d = F.col("tf").cast("double")
    score = idf * (
        (tf_d * F.lit(k1 + 1.0))
        / (tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "term",
            "doc_id",
            F.col("tf").cast("long").alias("tf"),
            "dl",
            score.alias("bm25"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = INDEX_MAX_POSTINGS,
) -> DataFrame:
    """Term → bounded posting list (first ``max_postings`` doc ids in
    ascending order) + full document frequency.

    The posting list is bounded *before* ``collect_list`` via a windowed
    ``row_number`` over the same ``term`` partitioning the final groupBy
    uses — O(max_postings) aggregation state per term (see module
    notes). ``n_docs`` comes from a separate partial-aggregable grouped
    count, broadcast-joined back onto the posting lists (r15): the old
    whole-partition window count forced WindowExec to BUFFER every term
    partition in full — a stopword term is a document-count-sized
    partition, spilled through the 4096-row window buffer — while
    ``row_number``'s running frame streams. Measured at the 10× fixture
    (2.67 M exploded rows): 4.6 s → 3.4 s warm; a single-branch variant
    deriving n_docs as max(_rn) in the aggregate measured 4.4 s (the
    aggregate then consumes every pre-filter row) and raising the window
    buffer threshold to 2 M rows only reached 4.5 s — both rejected.
    The df table is vocabulary-sized, the same broadcast class as
    bm25_scores' per-term df table.
    """
    # no CPU rebalance: the explode feeds the term-keyed window shuffle
    # directly, so an upstream fan-out is a pure extra exchange — unlike
    # tfidf_top_terms (whose partial aggregate FUSES with the explode and
    # serializes on an under-split scan), and the A/B holds under the
    # input-sized DOP too (round 12, 10× fixture: plain 4.7 s vs
    # fanned 5.8 s)
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term"),
    )
    df_tbl = terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w_rank = Window.partitionBy("term").orderBy("doc_id")
    ranked = terms.select(
        "term",
        "doc_id",
        F.row_number().over(w_rank).alias("_rn"),
    )
    posts = (
        ranked.where(F.col("_rn") <= max_postings)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
    )
    return posts.join(F.broadcast(df_tbl), "term").select(
        "term", "n_docs", "postings"
    )
