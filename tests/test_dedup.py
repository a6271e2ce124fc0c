"""Dedup operator semantics on crafted corpora (SURVEY §2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_dedup_groups_identical_texts(spark):
    from financial_big_data_exp_4_spark.operators import exact_dedup

    docs = _docs(spark, ["alpha beta", "gamma", "alpha beta", "alpha beta"])
    rows = {r["keep_doc_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert rows == {0: 3, 1: 1}


def test_minhash_finds_near_duplicate_pair(spark):
    from financial_big_data_exp_4_spark.operators import minhash_candidate_pairs

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long tune about distributed systems and parquet files at scale"
    )
    near = base.replace("lazy", "sleepy")  # one-word edit → high jaccard
    far = (
        "completely different content with no overlap whatsoever in its "
        "character shingles because every word here is chosen differently"
    )
    docs = _docs(spark, [base, near, far])
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_candidate_pairs(docs).collect()
    }
    assert (0, 1) in pairs
    assert pairs[(0, 1)] >= 0.5
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_minhash_bucket_cap_bounds_degenerate_corpus(spark):
    """Boilerplate-heavy corpus: every doc shares identical text, so every
    band bucket holds all N docs and the uncapped join is all-pairs
    (N·(N-1)/2). A cap below N empties every bucket → zero candidates,
    while leaving a well-behaved corpus's output untouched."""
    from financial_big_data_exp_4_spark.operators import minhash_candidate_pairs

    n = 40
    boiler = [
        "identical boilerplate header repeated across every document in "
        "the crawl exactly the same way each time"
    ] * n
    docs = _docs(spark, boiler)
    uncapped = minhash_candidate_pairs(docs).count()
    assert uncapped == n * (n - 1) // 2  # degenerate: all-pairs
    capped = minhash_candidate_pairs(docs, max_bucket_size=10).count()
    assert capped == 0  # every bucket over the cap → dropped before pairing

    # sanity: the cap is inert on a corpus whose buckets are small
    varied = _docs(
        spark,
        [f"document number {i} speaks about topic {i * 7} uniquely" for i in range(20)],
    )
    def pair_set(df):
        return {
            (r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in df.collect()
        }

    assert pair_set(
        minhash_candidate_pairs(varied, max_bucket_size=10)
    ) == pair_set(minhash_candidate_pairs(varied))


def test_simhash_identical_texts_equal_and_near_texts_close(spark):
    from financial_big_data_exp_4_spark.operators import simhash_docs

    t = "spark engines shuffle data between executors for aggregation"
    docs = _docs(spark, [t, t, "unrelated words entirely about gardening"])
    sims = {r["doc_id"]: r["simhash"] for r in simhash_docs(docs).collect()}
    assert sims[0] == sims[1]
    assert sims[0] != sims[2]
    assert 0 <= sims[0] < 2**52


def test_simhash_neardup_pairs_pigeonhole_complete(spark):
    """Banding with bands = max_hamming + 1 must return EXACTLY the pairs
    within the radius — banding prunes, it never drops an in-radius pair
    (pigeonhole: ≤3 flipped bits cannot touch all 4 bands)."""
    from financial_big_data_exp_4_spark.operators import (
        simhash_docs,
        simhash_neardup_pairs,
    )

    t = "spark engines shuffle data between executors for aggregation"
    texts = [t, t, t + " daily", "unrelated words entirely about gardening"]
    docs = _docs(spark, texts)
    sims = {r["doc_id"]: r["simhash"] for r in simhash_docs(docs).collect()}
    expected = {
        (a, b): bin(sims[a] ^ sims[b]).count("1")
        for a in sims
        for b in sims
        if a < b and bin(sims[a] ^ sims[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs).collect()
    }
    assert got == expected
    assert (0, 1) in got and got[(0, 1)] == 0  # identical pair survives


def test_ngram_jaccard_adjacent_bounds(spark):
    from financial_big_data_exp_4_spark.operators import ngram_jaccard_adjacent

    docs = _docs(spark, ["a b c d", "a b c d", "x y", "short"])
    rows = {(r["doc_a"], r["doc_b"]): r for r in ngram_jaccard_adjacent(docs).collect()}
    assert rows[(0, 1)]["jaccard"] == 1.0  # identical docs
    assert rows[(1, 2)]["jaccard"] == 0.0  # disjoint bigrams
    # single-token doc → empty bigram set; 0/0 guarded to 0.0, not NULL/NaN
    assert rows[(2, 3)]["jaccard"] == 0.0
    assert rows[(2, 3)]["n_union"] == 1


def test_normalize_text_idempotent_and_flags(spark):
    from financial_big_data_exp_4_spark.operators import normalize_text

    docs = _docs(
        spark,
        ["Hello\t WORLD\n\n again", "already clean", "  padded  "],
    )
    once = normalize_text(docs)
    rows = {r["doc_id"]: r for r in once.collect()}
    assert rows[0]["norm_text"] == "hello world again"
    assert rows[0]["changed"] is True
    assert rows[1]["changed"] is False
    # idempotency: normalizing the normalized text changes nothing
    again = normalize_text(
        once.select("doc_id", once.norm_text.alias("text"))
    )
    assert all(not r["changed"] for r in again.collect())


def test_incremental_neardup_flags_and_best(spark):
    """Exact dup flagged by md5; near-dup finds its corpus twin; a clean
    doc gets (False, NULL, 0)."""
    from financial_big_data_exp_4_spark.operators.dedup import (
        incremental_neardup,
    )

    # non-repetitive body: repeated phrases collapse to a tiny shingle
    # SET (set semantics), which would let a short tail dominate Jaccard
    base = " ".join(f"word{i * 37 % 997}x{i}" for i in range(150))
    corpus = spark.createDataFrame(
        [(0, base), (2, "completely different corpus text here " * 6)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base),               # exact dup of 0
            (3, base + "tail edit"),  # near dup of 0 (Jaccard ≈ 0.99)
            (5, "zzz qqq xxx unrelated prose " * 8),  # clean
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["is_exact_dup"],
            r["best_match"],
            r["n_candidates"],
        )
        for r in incremental_neardup(new, corpus).collect()
    }
    assert got[1][0] is True and got[1][1] == 0
    assert got[3][0] is False and got[3][1] == 0 and got[3][2] >= 1
    assert got[5] == (False, None, 0)


def test_incremental_neardup_signed_path_equivalent(spark):
    """Pre-signing via signed_docs is observationally identical to the
    raw-text path — the production corpus signature table contract."""
    from financial_big_data_exp_4_spark.operators.dedup import (
        incremental_neardup,
        signed_docs,
    )

    base = " ".join(f"tok{i * 53 % 997}y{i}" for i in range(120))
    corpus = spark.createDataFrame(
        [(0, base), (2, "some other unrelated corpus body " * 7)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, base), (5, "fully novel content never seen " * 9)],
        "doc_id long, text string",
    )
    raw = sorted(
        tuple(r) for r in incremental_neardup(new, corpus).collect()
    )
    signed = sorted(
        tuple(r)
        for r in incremental_neardup(
            signed_docs(new), signed_docs(corpus)
        ).collect()
    )
    assert raw == signed and len(raw) == 2


def test_degenerate_signatures_do_not_clique(spark):
    """Shingle-less (< SHINGLE_K chars) docs all share the all-sentinel
    minhash signature, and token-less docs get the out-of-domain simhash
    sentinel -1 — both sentinel classes must be EXCLUDED from band
    pairing, or every such pair becomes a false near-dup candidate (an
    O(n^2) clique). Exact dedup remains the operator that covers
    identical short docs."""
    from financial_big_data_exp_4_spark.operators.dedup import (
        minhash_candidate_pairs,
        simhash_neardup_pairs,
    )

    short = spark.createDataFrame(
        [(1, "cat"), (2, "dog"), (3, "hi ok"),
         (4, "a real sentence with plenty of shingle material here"),
         (5, "a real sentence with plenty of shingle material here!")],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(short).collect()
    }
    assert (1, 2) not in pairs and (1, 3) not in pairs and (2, 3) not in pairs
    assert (4, 5) in pairs  # real near-dups still pair

    symbolic = spark.createDataFrame(
        [(1, "!!!"), (2, "???"), (3, "......"),
         (4, "genuine words appear here"), (5, "genuine words appear here")],
        "doc_id long, text string",
    )
    sp = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_neardup_pairs(symbolic).collect()
    }
    assert all(a not in (1, 2, 3) and b not in (1, 2, 3) for a, b in sp)
    assert (4, 5) in sp


def test_simhash_zero_signature_is_contentful_not_sentinel(spark):
    """A contentful doc CAN legitimately hash to simhash 0 (every bit-sum
    nonpositive) — e.g. exactly two tokens whose 52-bit hashes share no
    set bits, so each bit sums to 0 or -2. Such docs must still
    participate in near-dup pairing; only the out-of-domain sentinel -1
    (token-less) is excluded. Tokens w39276/w109046 were mined offline:
    md5-52(w39276) & md5-52(w109046) == 0."""
    from financial_big_data_exp_4_spark.operators.dedup import (
        simhash_docs,
        simhash_neardup_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "w39276 w109046"), (2, "w39276 w109046"), (3, ""),
         (4, None)],
        "doc_id long, text string",
    )
    sims = {r["doc_id"]: r["simhash"] for r in simhash_docs(docs).collect()}
    assert sims[1] == 0 and sims[2] == 0  # legitimate zero signature
    assert sims[3] == -1 and sims[4] == -1  # token-less -> sentinel

    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_neardup_pairs(docs).collect()
    }
    assert (1, 2, 0) in got  # zero-signature docs still pair
    assert all(a not in (3, 4) and b not in (3, 4) for a, b, _ in got)


def test_simhash_bucket_cap_drops_degenerate_bucket_both_sides(spark):
    """The cap must apply to the band rows BEFORE both join sides derive
    from them: capping only the exact side leaves the ×27 multiprobe
    explode of an over-full bucket's members uncapped — the identity
    probes of the dropped docs would join the surviving exact rows and
    the degenerate bucket's pairs would flow straight through the guard
    (round-9 review finding)."""
    from financial_big_data_exp_4_spark.operators import (
        simhash_neardup_pairs,
    )

    n = 12
    boiler = _docs(
        spark,
        ["identical boilerplate body shared by every crawl document"] * n,
    )
    assert simhash_neardup_pairs(boiler).count() == n * (n - 1) // 2
    assert simhash_neardup_pairs(boiler, max_bucket_size=5).count() == 0

    # inert on a corpus whose buckets are small
    varied = _docs(
        spark,
        [f"unique document {i} on its own subject {i * 13}" for i in range(8)],
    )
    assert sorted(
        map(tuple, simhash_neardup_pairs(varied, max_bucket_size=5).collect())
    ) == sorted(map(tuple, simhash_neardup_pairs(varied).collect()))


def test_shingle_selection_shift_robust_and_fallback_parity(spark):
    """Round-10 regression pins: (a) the content-anchored shingle sample
    is shift-ROBUST — a one-token edit that changes text length by an
    ODD amount (the case that zeroed the old positional stride's
    overlap) keeps shingle Jaccard high; (b) anchor-less texts fall back
    to exhaustive positions, keeping `shingle set non-empty iff
    len >= k` exact; (c) the DuckDB oracle expression produces the
    IDENTICAL hash set on both normal and degenerate inputs."""
    import duckdb

    from financial_big_data_exp_4_spark.operators.dedup import (
        SHINGLE_K,
        shingle_hash_set,
    )
    from financial_big_data_exp_4_spark.plans.oracle_ext import (
        _shingle_hashes,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays a long tune about distributed systems at scale"
    )
    edited = base.replace("lazy", "sleepier")  # +4 chars... use odd delta
    edited_odd = base.replace("lazy", "sly")  # -1 char: odd length shift
    # 'aaaa...' = all code point 97 (odd): no anchored position exists
    anchorless = "a" * 20
    texts = [base, edited, edited_odd, anchorless, "short", None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    rows = {
        r["i"]: r["s"]
        for r in df.select("i", shingle_hash_set("text").alias("s")).collect()
    }

    def jac(a, b):
        sa, sb = set(a), set(b)
        return len(sa & sb) / len(sa | sb)

    # the pre-fix positional stride measured ≈ 0.02 here; ≥ 0.7 pins the
    # shift-robust behavior with slack for this short (~110 char) text
    assert jac(rows[0], rows[2]) >= 0.7, "odd-length edit must not zero overlap"
    assert jac(rows[0], rows[1]) >= 0.7
    # anchor-less long text: fallback keeps the set non-empty (and at
    # exhaustive positions a constant text has exactly ONE distinct shingle)
    assert len(rows[3]) == 1
    assert rows[4] == []  # shorter than one shingle
    assert rows[5] in (None, [])  # NULL text never yields shingles

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)]
    )
    oracle = {
        i: s
        for i, s in con.execute(
            f"SELECT i, {_shingle_hashes()} AS s FROM t"
        ).fetchall()
    }
    for i in range(len(texts)):
        eng = sorted(rows[i]) if rows[i] is not None else []
        ora = sorted(oracle[i]) if oracle[i] is not None else []
        assert eng == ora, f"engine/oracle shingle divergence on row {i}"


def test_bloom_prefilter_contract(spark):
    """The Bloom membership contract on a crafted corpus/batch split:
    zero false negatives (every exact member bloom-hits), the word table
    is ceil(m/63) rows at most, and NULL-text probes are non-members.
    Uses the declared split_mod so ids control which side a row lands."""
    from pyspark.sql import functions as F

    from financial_big_data_exp_4_spark.operators.dedup import (
        bloom_prefilter_proof,
        bloom_words,
        bloom_words_size,
    )

    rows = []
    # corpus rows (id % 5 != 0) and batch rows (id % 5 == 0); batch ids
    # 0,5,15 duplicate corpus texts, 10 is novel, 20 is NULL text
    texts = {1: "alpha", 2: "beta", 3: "gamma", 4: "delta", 6: "epsilon"}
    rows += [(i, t) for i, t in texts.items()]
    rows += [(0, "alpha"), (5, "beta"), (15, "epsilon"), (10, "novel-doc"),
             (20, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in bloom_prefilter_proof(docs, split_mod=5).collect()
    }
    assert set(out) == {0, 5, 10, 15, 20}
    for i in (0, 5, 15):
        assert out[i].exact_hit and out[i].bloom_hit, i
    assert not out[10].exact_hit
    assert not out[20].exact_hit and not out[20].bloom_hit
    assert all(r.no_false_negative for r in out.values())
    # word-table bound: never more rows than words in the filter
    m = bloom_words_size(5)
    corpus = docs.where(F.col("doc_id") % 5 != 0).select(
        F.md5("text").alias("_h")
    )
    assert bloom_words(corpus, m).count() <= m // 63


def test_bloom_fp_rate_within_design_bound(spark):
    """FP operating point: at 10 bits/key with k=4 the design rate is
    ~1.2%; assert the measured rate on 2k disjoint probes stays under a
    generous 3x bound (deterministic given md5 — no flake)."""
    from pyspark.sql import functions as F

    from financial_big_data_exp_4_spark.operators.dedup import (
        bloom_membership,
        bloom_words,
        bloom_words_size,
    )

    corpus = spark.range(1_000).select(
        F.md5(F.concat(F.lit("c"), F.col("id"))).alias("_h")
    )
    probes = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.md5(F.concat(F.lit("p"), F.col("id"))).alias("_h"),
    )
    m = bloom_words_size(1_000)
    words = bloom_words(corpus, m)
    hits = (
        bloom_membership(probes, words, m)
        .where(F.col("bloom_hit"))
        .count()
    )
    assert hits / 2_000 <= 0.036, hits
