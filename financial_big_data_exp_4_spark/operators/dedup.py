"""Deduplication operators: exact, MinHash-LSH near-dup, SimHash, n-gram
Jaccard (BASELINE north star; no counterpart in the reference — its workload
is single-table relational, so these extend the engine for LLM-data use).

100 TB design notes
-------------------
* **Exact dedup** is a hash-groupBy on the md5 digest of the text — the
  shuffle key is a uniform 128-bit digest, so partitions balance perfectly
  regardless of content skew, and the shuffled rows carry only
  ``(digest, doc_id)``, never the text payload.
* **MinHash** signatures are computed map-side with native higher-order
  functions (``transform``/``array_min`` over the token-hash array — one
  pass per hash function, zero shuffles, whole-stage codegen). The LSH
  band join then shuffles ``(band_id, band_key)`` pairs — B rows per doc —
  and candidate pairs come from equi-joins inside band buckets. There is
  deliberately NO all-pairs comparison anywhere: cost is
  O(docs × B + Σ bucket²), and bucket sizes concentrate near 1 for
  non-duplicate corpora. Pathological buckets (boilerplate-heavy corpora
  where one band key collects thousands of docs) are capped by the
  ``max_bucket_size`` guard in :func:`minhash_candidate_pairs` — a window
  count over the same ``(band_id, band_key)`` partitioning the join
  shuffles on, so the cap adds no extra exchange. Default off so the
  declared oracle semantics stay closed-form.
* **SimHash** is one 52-bit signature per doc, computed entirely inside a
  per-row expression tree (nested ``transform``/``aggregate`` over 52 bit
  positions × token hashes) — map-only, no shuffle at all.
* All hashes route through md5 (first 13 hex digits → 52-bit int) so the
  DuckDB oracle computes bit-identical values — see
  ``functions.core.md5_hash64``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from financial_big_data_exp_4_spark.functions.core import bind_once, md5_hash64

#: Modulus for minhash permutations: largest prime < 2^30 keeps every
#: intermediate (h * a + b) below 2^63 with the multipliers used here.
MINHASH_P = 1_000_000_007

#: (a, b) pairs for the 16 affine "permutations" h -> (a*h + b) mod P.
#: Fixed small primes — deterministic across engines and runs.
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (131, 17),
    (137, 89),
    (139, 283),
    (149, 419),
    (151, 547),
    (157, 661),
    (163, 811),
    (167, 947),
    (173, 1087),
    (179, 1229),
    (181, 1381),
    (191, 1523),
    (193, 1663),
    (197, 1823),
    (199, 1979),
    (211, 2129),
)

#: 4 bands × 4 rows: candidate threshold ≈ (1/B)^(1/R) ≈ 0.71 Jaccard,
#: P(candidate) = 1 − (1 − s⁴)⁴ ≈ 0.94 at s = 0.875 (a one-token edit
#: on a 30-token doc) and ≈ 0.98+ for longer docs. RECALL_r09 measured
#: the legacy 2 bands × 4 rows at 0.42 planted-near-dup recall; the
#: diagnosis was NOT the banding math but the positional shingle stride
#: (see SHINGLE_SELECT_MOD) collapsing half the planted pairs to
#: Jaccard ≈ 0.02. With the shift-robust selection restoring planted
#: Jaccard to 0.63-0.97 (median 0.93 on the recall fixture), doubling
#: the bands at the SAME 4-row width lifts measured recall ≥ 0.95 while
#: keeping false candidates ∝ Σ_pairs s⁴ — background corpus pairs sit
#: at s ≈ 0.01-0.04, so s⁴ ≈ 10⁻⁸ and candidate volume stays linear in
#: N (an 8 bands × 2 rows variant was measured too: recall 1.0 but
#: B·s² background admission ⇒ 181k candidates at the 10× fixture vs
#: ~7k here — a quadratic onset no bucket cap should be asked to hide).
#: Recall-vs-cost for the declared setting is measured per round by
#: tools/recall_bench.py into RECALL_r{N}.json.
#: (Shingle sets, not word sets, drive the signature — see SHINGLE_K — so
#: thematically-similar-but-different documents don't collide.)
#: The historical round-2..9 parameterization (8 perms, 2 bands × 4
#: rows) was RETIRED in round 14 (r13 VERDICT #8): its measured near-dup
#: recall plateaued at 0.885 at 10× vs this setting's 0.961
#: (RECALL_r13.json carries the final A/B), and a second, worse
#: parameterization of the same operator is a trap for users.
MINHASH_BANDS = 4
MINHASH_ROWS_PER_BAND = 4

#: Character-shingle width for minhash. Shingles capture word *order*;
#: word-token sets do not (any two docs over a shared small vocabulary
#: have near-identical token sets — observed on the fixture corpus, where
#: token-set LSH degenerated to ~all-pairs).
SHINGLE_K = 8
#: Content-anchored shingle selection: hash only shingles whose FIRST
#: character has an even code point (~half of all positions on real
#: text, so the dominant md5 cost halves — same saving the round-2..9
#: positional stride bought). Selection is a function of the shingle's
#: own content, never its position: the old ``every 2nd position``
#: stride was shift-FRAGILE — a single-character length change moves
#: every downstream position's parity, so an odd-length one-token edit
#: destroyed the entire downstream sample (measured: 53/100 planted
#: one-token-edit pairs at Jaccard ≈ 0.02 instead of ≈ 0.9; THAT — not
#: banding probability — was the real cause of RECALL_r09's 0.42
#: near-dup recall). An even-code-anchored shingle survives any edit
#: outside its own 8 chars, so planted-pair Jaccard is ≥ 0.63 and
#: recall is governed by the banding math again.
SHINGLE_SELECT_MOD = 2

SIMHASH_BITS = 52  # md5_hash64 yields 52 usable bits


def tokenize(text: Column | str) -> Column:
    """Lowercased word tokens (``[a-z0-9]+`` runs), order-preserving."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit("[a-z0-9]+"), 0)


def token_hash_set(text: Column | str) -> Column:
    """Distinct 52-bit md5 hashes of the token *set* (set semantics — each
    distinct token contributes once, the standard MinHash/SimHash input)."""
    return F.array_distinct(F.transform(tokenize(text), md5_hash64))


def shingle_hash_set(
    text: Column | str,
    k: int = SHINGLE_K,
    select_mod: int = SHINGLE_SELECT_MOD,
) -> Column:
    """Distinct 52-bit md5 hashes of content-anchored k-char shingles;
    [] iff len < k.

    ``select_mod`` parameterizes the anchor density for MEASUREMENT
    (tools/recall_bench.py's anchored-vs-exhaustive cost row):
    ``1`` hashes every position (exhaustive — ``x % 1 == 0`` always, so
    the fallback branch is unreachable and the ``non-empty ⟺ len ≥ k``
    invariant holds trivially). Every declared query uses the module
    default (2).

    Selection (see ``SHINGLE_SELECT_MOD``): a shingle is hashed iff its
    first character's code point is even — shift-robust ~½ sampling, so
    the md5 stage costs half of exhaustive shingling. Degenerate texts
    whose candidate positions ALL start on odd code points fall back to
    exhaustive positions, which keeps the invariant ``shingle set
    non-empty ⟺ len(text) ≥ k`` EXACT — minhash_candidate_pairs'
    cheap sentinel-exclusion predicate (`length(text) >= SHINGLE_K`)
    and the oracle's ``mh_0 < P`` band filter depend on it; without the
    fallback an anchor-less long doc would carry the all-sentinel
    signature into banding on the engine side only and clique with
    every other such doc."""
    c = F.col(text) if isinstance(text, str) else text
    # Linear-in-length extraction (round 11): shingles are built from a
    # per-row CHARACTER ARRAY via slice+array_join, never per-position
    # `substr`. Spark's UTF8String addresses characters by scanning
    # bytes from the front, so `substr(i, k)` is O(i) and summing over
    # every position made the whole shingle stage O(len²) PER DOCUMENT —
    # invisible at the fixture's ~700 chars, but measured 167 s warm for
    # just 500 docs of 10k-50k chars (9.4× faster via slice at 32k chars
    # in isolation, and growing with length). slice on the materialized
    # array is O(k) by direct index; values are bit-identical, multibyte
    # included (split('') and substr both count CHARACTERS).
    #
    # The char array is bound ONCE via ``bind_once``: a Python Column
    # variable spliced into HOF lambdas duplicates the split SUBTREE at
    # every reference, and HOFs evaluate interpreted (CodegenFallback),
    # re-splitting the full text per position — O(len²) again through
    # the back door (round-11 finding: a 945-CPU-second single task at
    # the 100× capped-recall fixture; jstack showed StringSplit.eval
    # under ArrayFilter.eval).

    def _hashes(cs: Column) -> Column:
        pos = F.sequence(F.lit(1), F.length(c) - F.lit(k - 1))
        sel = F.filter(
            pos,
            lambda i: F.ascii(F.element_at(cs, i)) % select_mod == 0,
        )
        anchored = F.when(F.size(sel) > 0, sel).otherwise(pos)
        return F.transform(
            anchored,
            lambda i: md5_hash64(F.array_join(F.slice(cs, i, k), "")),
        )

    hashes = bind_once(F.split(c, ""), _hashes)
    return F.when(F.length(c) >= k, F.array_distinct(hashes)).otherwise(
        F.array().cast("array<long>")
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) → (keeper = min id, copy count).

    One hash-partitioned aggregate; the canonical "keep the smallest id"
    policy makes the output deterministic.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def with_minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    coeffs: Sequence[tuple[int, int]] = MINHASH_COEFFS,
    select_mod: int = SHINGLE_SELECT_MOD,
) -> DataFrame:
    """Append ``mh_0..mh_{K-1}`` minhash columns (map-only, codegen'd).

    ``select_mod`` (measurement-only knob, see :func:`shingle_hash_set`)
    selects the shingle anchor density; declared queries use the default.

    ``mh_i = min over distinct shingle hashes h of (h*a_i + b_i) mod P``;
    documents shorter than one shingle get the sentinel P (unreachable by
    any real hash). The shingle-hash array is materialized ONCE as a real
    column — Spark's CollapseProject does not inline non-cheap aliased
    expressions (SPARK-36718), so the md5 work is not duplicated across
    the K minhash expressions.

    The CPU rebalance keys on the UNIQUE ``id_col``, never the text: on a
    duplicate-heavy corpus — this operator's own target workload — a
    text-keyed repartition would hash every copy of a duplicated document
    onto one partition and re-serialize exactly the md5-shingle stage the
    rebalance exists to parallelize.
    """
    from financial_big_data_exp_4_spark.session import rebalance_for_cpu

    docs = rebalance_for_cpu(docs, id_col)
    df = docs.withColumn(
        "_th",
        F.transform(
            shingle_hash_set(text_col, select_mod=select_mod),
            lambda h: h % MINHASH_P,
        ),
    )

    def perm(a: int, b: int):
        # closure factory: a plain lambda with default args would present a
        # 3-parameter signature to Spark's higher-order-function binder
        return lambda h: (h * a + b) % MINHASH_P

    for i, (a, b) in enumerate(coeffs):
        mh = F.array_min(F.transform(F.col("_th"), perm(a, b)))
        df = df.withColumn(f"mh_{i}", F.coalesce(mh, F.lit(MINHASH_P)))
    return df.drop("_th")


def _cap_band_buckets(bands: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """Drop over-full ``(band_id, band_key)`` buckets before pairing.

    Shared by the MinHash and SimHash band joins: the window count
    partitions on the SAME key the join shuffles on, so the cap reuses
    that exchange instead of adding one. ``None`` = no cap (the declared
    closed-form oracle semantics)."""
    if max_bucket_size is None:
        return bands
    from pyspark.sql import Window

    w = Window.partitionBy("band_id", "band_key")
    return (
        bands.withColumn("_bucket_n", F.count("*").over(w))
        .where(F.col("_bucket_n") <= max_bucket_size)
        .drop("_bucket_n")
    )


def _band_key(band: int, rows_per_band: int = MINHASH_ROWS_PER_BAND) -> Column:
    r = rows_per_band
    parts = []
    for j in range(band * r, band * r + r):
        parts.append(F.col(f"mh_{j}").cast("string"))
    return F.concat_ws(",", *parts)


def minhash_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    coeffs: Sequence[tuple[int, int]] = MINHASH_COEFFS,
    n_bands: int = MINHASH_BANDS,
    rows_per_band: int = MINHASH_ROWS_PER_BAND,
) -> DataFrame:
    """Banded-LSH near-duplicate candidates with estimated similarity.

    Pipeline: signature (map-only) → explode B ``(band_id, band_key)`` rows
    per doc, signature columns riding along → self-equi-join inside band
    buckets (never all-pairs) → estimated Jaccard = fraction of agreeing
    minhash components, read off the joined row → distinct pairs.
    Output: (doc_a, doc_b, est_jaccard), doc_a < doc_b.

    ``max_bucket_size`` caps pathological band buckets: buckets with more
    than N member docs are dropped *before* pairing, bounding the join at
    O(Σ min(bucket, N)²) on boilerplate-heavy corpora where one band key
    would otherwise collect thousands of docs and degrade toward
    all-pairs. The size comes from a window count partitioned by the same
    ``(band_id, band_key)`` the join shuffles on, so the guard reuses that
    exchange rather than adding one. Docs in an over-full bucket can still
    pair through their other, non-degenerate bands — standard LSH recall
    semantics. Default ``None`` = no cap (the declared closed-form oracle
    semantics).

    ``coeffs`` / ``n_bands`` / ``rows_per_band`` select the banding
    parameterization (len(coeffs) must equal n_bands × rows_per_band).
    Every declared query uses the module defaults; the knob exists so a
    deployment (or tools/recall_bench.py) can measure an alternative
    banding's recall-vs-cost curve before adopting it.
    """
    k = len(coeffs)
    assert k == n_bands * rows_per_band, (k, n_bands, rows_per_band)
    # sentinel exclusion happens HERE, on the raw text, as the cheap
    # equivalent of mh_0 < P — see the comment on `bands` below
    sig = with_minhash_signature(
        docs.where(F.length(F.col(text_col)) >= SHINGLE_K),
        text_col,
        id_col,
        coeffs=coeffs,
    ).select(
        F.col(id_col).alias("doc"), *[F.col(f"mh_{i}") for i in range(k)]
    )
    # The signature columns RIDE the band explode (K longs ≈ 128 bytes
    # per band row at the 16-perm default) so agreement counts fall
    # straight out of the band join —
    # the alternative (join signatures back onto the pair list) reads the
    # corpus and recomputes every md5 shingle twice more: the signature
    # expression is the dominant cost and Spark does not share scans
    # between self-join branches. Together with the CPU rebalance above,
    # measured 3.1× on the whole query at sf0.1 (3.06s → 0.99s warm).
    from financial_big_data_exp_4_spark.session import persist_scoped

    # persist the exploded band rows: both self-join branches read them,
    # and Spark does not share scans between branches — unpersisted, the
    # dominant md5-shingle signature expression would compute twice.
    # Shingle-less (shorter than SHINGLE_K) documents are excluded from
    # banding: they all carry the identical all-sentinel signature, which
    # would clique EVERY short doc pair at est_jaccard 1.0 — an
    # O(n_short²) blowup and false merges downstream (exact dedup is the
    # operator that covers identical short docs). Oracle in lockstep.
    #
    # The sentinel exclusion is the CHEAP EQUIVALENT predicate
    # `length(text) >= SHINGLE_K`, applied to the raw docs BEFORE the
    # signature — never `where(mh_0 < P)` over the computed column.
    # Catalyst's predicate pushdown substitutes aliased expressions into
    # predicates regardless of cost (unlike CollapseProject, see
    # SPARK-36718 note in with_minhash_signature), so a filter over
    # mh_0 is rewritten to the full md5-shingle minhash expression and
    # pushed beneath the CPU-rebalance Exchange — onto the
    # single-row-group scan task, serializing the dominant signature
    # stage onto ONE core and recomputing it again post-exchange (the
    # round-9 scale gate measured the simhash twin at 190s vs 9.5s for
    # 500k docs). The length predicate is exactly `shingle set
    # non-empty` (shingle_hash_set emits [] iff length < k, and NULL
    # text fails the comparison like it fails banding), pushes down
    # harmlessly, and unlike a filter-above-cache formulation it cannot
    # regress to the expensive form when the persist slot is evicted.
    bands = persist_scoped(
        sig.select(
            "doc",
            *[F.col(f"mh_{i}") for i in range(k)],
            F.posexplode(
                F.array(
                    *[_band_key(b, rows_per_band) for b in range(n_bands)]
                )
            ).alias("band_id", "band_key"),
        )
    )
    bands = _cap_band_buckets(bands, max_bucket_size)
    a, b = bands.alias("a"), bands.alias("b")
    agree = sum(
        F.when(F.col(f"a.mh_{i}") == F.col(f"b.mh_{i}"), 1).otherwise(0)
        for i in range(k)
    )
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            # distinct AFTER the similarity projection: est_jaccard is a
            # function of the pair (signatures are functions of the doc
            # ids), so cardinality is identical and the dedup shuffle
            # carries 3 columns instead of 18.
            (agree.cast("double") / F.lit(float(k))).alias("est_jaccard"),
        )
        .distinct()
    )


def signed_docs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The dedup *signature table*: ``(id, _md5, mh_0..mh_{K-1})`` — one
    map-only pass computing both the exact-dup key and the minhash
    signature. This is the artifact a production incremental pipeline
    maintains as a real table alongside the corpus (the expensive
    md5-shingle map runs once per ingested document, ever);
    :func:`incremental_neardup` accepts it pre-computed on either side.
    """
    k = len(MINHASH_COEFFS)
    return with_minhash_signature(docs, text_col, id_col).select(
        id_col,
        F.md5(F.col(text_col)).alias("_md5"),
        *[F.col(f"mh_{i}") for i in range(k)],
    )


def incremental_neardup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental dedup of a NEW document batch against an EXISTING
    corpus — the form every ingestion pipeline actually runs (the
    self-join variants re-check the whole corpus against itself; this
    checks only new×corpus).

    Per new document: an exact-duplicate flag (md5 membership in the
    corpus) and the best LSH near-dup candidate (highest estimated
    Jaccard, ties to the smallest corpus doc id) with the candidate
    count. Plan shape: the NEW side is small by construction, so its
    exploded band rows **broadcast** into the corpus band rows — the
    corpus is scanned once, never shuffled for pairing (in production
    the corpus signatures/bands are a precomputed table, so even the
    signature map stage amortizes to zero). The broadcast side is kept
    MINIMAL (round-3 ADVICE): band rows carry only ``(n_doc, band_id,
    band_key)`` — the K-long signature does NOT ride the broadcast
    duplicated per band. The new side's signatures re-join onto the
    matched candidate pairs afterwards via a second (narrow, one-row-
    per-new-doc) broadcast, so total broadcast bytes scale as
    new_docs × (bands + 1) narrow rows rather than new_docs × bands × K
    wide ones. The exact-dup check is a left join on md5 — uniform
    128-bit key, new side tiny.
    Output: (doc_id, is_exact_dup, best_match, best_est, n_candidates);
    best_match/best_est NULL and n_candidates 0 for clean docs.

    Either side may be passed as a pre-computed :func:`signed_docs`
    frame (detected by its ``mh_0``/``_md5`` columns) — the production
    shape, where the corpus signature table is maintained incrementally
    and this operator never re-hashes a document it has seen before.
    """
    k = len(MINHASH_COEFFS)

    def _signed(docs_df):
        if "mh_0" in docs_df.columns and "_md5" in docs_df.columns:
            return docs_df
        return signed_docs(docs_df, text_col, id_col)

    new_signed = _signed(new_docs)
    corpus_signed = _signed(corpus_docs)

    def _band_key_cols(prefix):
        return F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"{prefix}mh_{j}").cast("string")
                            for j in range(
                                b * MINHASH_ROWS_PER_BAND,
                                (b + 1) * MINHASH_ROWS_PER_BAND,
                            )
                        ],
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias(f"{prefix}band_id", f"{prefix}band_key")

    def _sig(signed_df, prefix):
        return signed_df.select(
            F.col(id_col).alias(f"{prefix}doc"),
            *[F.col(f"mh_{i}").alias(f"{prefix}mh_{i}") for i in range(k)],
        )

    # corpus side: streamed (never broadcast/shuffled) — signatures stay
    # attached so the pair's o-side agreement inputs need no re-join.
    # The mh_0 < P filters exclude shingle-less docs from PAIRING on both
    # sides (all-sentinel signatures would clique every short doc — see
    # minhash_candidate_pairs); short new docs still flow through the
    # exact-md5 flag path below, just with no LSH candidates.
    sig_old = _sig(corpus_signed, "o_")
    bands_old = sig_old.where(F.col("o_mh_0") < MINHASH_P).select(
        "o_doc", *[f"o_mh_{i}" for i in range(k)], _band_key_cols("o_")
    )
    # new side: signatures and band rows derived separately; only the
    # 3-column band rows broadcast into the pairing join
    sig_new = _sig(new_signed, "n_")
    bands_new = sig_new.where(F.col("n_mh_0") < MINHASH_P).select(
        "n_doc", _band_key_cols("n_")
    )

    pairs = (
        bands_old.join(
            F.broadcast(bands_new),
            (F.col("o_band_id") == F.col("n_band_id"))
            & (F.col("o_band_key") == F.col("n_band_key")),
        )
        .select("n_doc", "o_doc", *[f"o_mh_{i}" for i in range(k)])
        .distinct()  # o_mh_* is functionally dependent on o_doc
    )
    agree = sum(
        F.when(F.col(f"o_mh_{i}") == F.col(f"n_mh_{i}"), 1).otherwise(0)
        for i in range(k)
    )
    cand = pairs.join(F.broadcast(sig_new), "n_doc").select(
        F.col("n_doc").alias("doc_id"),
        F.col("o_doc").alias("cand_doc"),
        (agree.cast("double") / F.lit(float(k))).alias("est"),
    )
    best = cand.groupBy("doc_id").agg(
        F.max(F.struct(F.col("est"), (-F.col("cand_doc")).alias("_nc"))).alias(
            "_best"
        ),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    corpus_md5 = corpus_signed.select("_md5").distinct()
    flagged = new_signed.select(
        F.col(id_col).alias("doc_id"), F.col("_md5").alias("_nmd5")
    ).join(
        corpus_md5.withColumn("_hit", F.lit(1)),
        F.col("_nmd5") == F.col("_md5"),
        "left",
    )
    return (
        flagged.join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_hit").isNotNull().alias("is_exact_dup"),
            (-F.col("_best._nc")).alias("best_match"),
            F.col("_best.est").alias("best_est"),
            F.coalesce(F.col("n_candidates"), F.lit(0)).alias(
                "n_candidates"
            ),
        )
    )


#: SimHash as ONE fold over the token hashes carrying a 52-wide bit-sum
#: accumulator (``zip_with`` pairs the accumulator with the bit indices),
#: then one fold over the signed sums to assemble the signature. Integer
#: ``shiftright``/``&``/``shiftleft`` throughout — bit-identical to the
#: oracle's ``h // 2^b % 2`` on nonnegative 52-bit hashes. The previous
#: formulation (one ``aggregate`` per bit, double ``pow``/``floor``) ran
#: 52 separate interpreted folds over the array and measured 15× slower
#: at sf0.1 (10.0s → 0.68s).
_SIMHASH_EXPR = f"""IF(coalesce(size(_th), 0) <= 0, CAST(-1 AS BIGINT),
  aggregate(
    zip_with(
      aggregate(_th, array_repeat(CAST(0 AS BIGINT), {SIMHASH_BITS}),
        (acc, h) -> zip_with(acc, sequence(0, {SIMHASH_BITS - 1}),
          (a, b) -> a + CAST(shiftright(h, b) & 1 AS BIGINT) * 2 - 1)),
      sequence(0, {SIMHASH_BITS - 1}),
      (s, b) -> IF(s > 0, shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))),
    CAST(0 AS BIGINT), (acc, x) -> acc + x))"""


def simhash_docs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """52-bit SimHash per document — map-only, no shuffle.

    For each bit b: sum over distinct token hashes of ±1 (by bit b of the
    hash); bit set iff the sum is positive (ties → 0, deterministic).
    Pure integer bit arithmetic, reproducible on any engine (the DuckDB
    oracle uses integer division by 2^b — identical results). A token-less
    document (empty or NULL text / no alphanumeric runs) gets the
    OUT-OF-DOMAIN sentinel -1 — real signatures live in [0, 2^52), so the
    sentinel can never collide with a contentful document, including the
    legitimate all-zero signature of a doc whose 52 bit-sums are all
    nonpositive (which a 0-as-sentinel scheme would silently drop from
    pairing). Oracle in lockstep.

    The token-hash array is materialized as a column first — inlining it
    would re-run tokenize+md5 once per bit position (observed 50×
    slowdown before this was split). See ``_SIMHASH_EXPR`` for the
    single-pass fold structure.
    """
    from financial_big_data_exp_4_spark.session import rebalance_for_cpu

    base = rebalance_for_cpu(docs, id_col).select(
        F.col(id_col).alias("doc_id"), token_hash_set(text_col).alias("_th")
    )
    return base.select("doc_id", F.expr(_SIMHASH_EXPR).alias("simhash"))


def _prune_to_participants(
    docs: DataFrame, cand: DataFrame, id_col: str,
    hint_broadcast: bool = True,
) -> DataFrame:
    """Restrict ``docs`` to rows that participate in a candidate pair.

    Broadcast-semi-join against ``distinct(doc_a ∪ doc_b)`` — run this
    BEFORE any per-document verify computation (bigrams, text join).
    At 100 TB the corpus is petabyte-scale but the LSH candidate set is
    tiny (bucket-capped, near-dup-rate-bounded), so exact-verify work
    must be proportional to |candidates|, not |corpus|: without this
    prune the verify pass maps over and shuffles EVERY document twice.
    The broadcast hint is part of the declared scale contract:
    participants carry ONE bigint per row, bounded by 2·|candidate
    pairs|, and the LSH front end (band buckets capped, near-dup rate
    bounded) keeps that set orders of magnitude below the corpus. The
    hint IS binding — Spark honors an explicit ``broadcast()`` even for
    a large side — so a workload whose candidate set could exceed
    broadcast limits (≈ billions of pairs) must pass
    ``hint_broadcast=False`` to drop the hint and let statistics/AQE
    pick the join strategy (a shuffled semi-join is correct, just
    slower), instead of risking a driver OOM on a forced broadcast.
    """
    participants = (
        cand.select(F.col("doc_a").alias(id_col))
        .union(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    if hint_broadcast:
        participants = F.broadcast(participants)
    return docs.join(participants, id_col, "semi")


#: Cap used by the thresholded edit-distance verify: distances are only
#: meaningful near 0 for near-duplicates, so the DP can early-exit once
#: the distance provably exceeds this. Reported distance is
#: least(true_distance, EDIT_DISTANCE_CAP).
EDIT_DISTANCE_CAP = 100


def neardup_edit_distance(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pairs: DataFrame | None = None,
    cap: int = EDIT_DISTANCE_CAP,
    hint_broadcast: bool = True,
) -> DataFrame:
    """Capped character edit distance over the LSH candidate pairs.

    The third verify metric next to bigram Jaccard
    (:func:`neardup_verified_pairs`) and Hamming
    (:func:`simhash_neardup_pairs`): candidates come from the banded
    MinHash join (never all-pairs); the text is then pruned to candidate
    participants (broadcast semi-join — verify cost proportional to
    |candidates|, not |corpus|) and Levenshtein runs only on those
    |candidates| pairs. Output: (doc_a, doc_b, edit_dist) with
    ``edit_dist = least(true_distance, cap)``.

    100 TB: unbounded Levenshtein is O(len_a × len_b) per pair; the
    declared semantics cap it, so Spark's thresholded
    ``levenshtein(l, r, threshold)`` early-exits the DP once the banded
    diagonal exceeds ``cap`` — O(len × cap) per pair. The DuckDB oracle
    declares the identical ``least(levenshtein(...), cap)``.

    ``pairs``: optionally feed a precomputed candidate-pair frame
    (``doc_a``, ``doc_b`` columns) — e.g. a pipeline-shared
    materialization of :func:`minhash_candidate_pairs` — instead of
    re-deriving the signatures here. ``hint_broadcast=False`` drops the
    participant-broadcast hint for candidate sets too large to
    broadcast (see :func:`_prune_to_participants`).
    """
    from financial_big_data_exp_4_spark.session import persist_scoped

    if pairs is None:
        # the candidate plan feeds both the participant broadcast and the
        # pair join; persist so the LSH stage runs once, not twice
        pairs = persist_scoped(
            minhash_candidate_pairs(docs, text_col, id_col)
        )
    cand = pairs.select("doc_a", "doc_b")
    txt = _prune_to_participants(
        docs, cand, id_col, hint_broadcast=hint_broadcast
    ).select(
        F.col(id_col).alias("_edoc"), F.col(text_col).alias("_etext")
    )
    # The candidate list broadcasts into BOTH text joins below, so the
    # expensive Levenshtein projection runs at the PRUNED TEXT side's
    # partitioning — which is inherited from the documents scan (an
    # under-split single-row-group input runs it on ~1 task; measured
    # 18s serial vs ~1s parallel at the 10× scale fixture). Explicit
    # id-keyed repartition to cores; rebalance_for_cpu deliberately
    # refuses join-bearing plans like this pruned relation, and the
    # shuffle moves only |participants| rows (≤ 2·|candidates|), far
    # smaller than the corpus.
    txt = txt.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col("_edoc")
    )
    a = txt.select(
        F.col("_edoc").alias("doc_a"), F.col("_etext").alias("_ta")
    )
    b = txt.select(
        F.col("_edoc").alias("doc_b"), F.col("_etext").alias("_tb")
    )
    # Spark's 3-arg levenshtein returns -1 when distance > threshold;
    # folding -1 back to `cap` yields exactly least(distance, cap).
    lev = F.levenshtein(F.col("_ta"), F.col("_tb"), cap)
    # Length-difference prefilter (round-9 VERDICT #3): edit distance is
    # bounded below by abs(len_a − len_b) — insertions alone must bridge
    # the gap — so when the gap exceeds `cap` the declared output is
    # exactly `cap` and the O(len × cap) DP is skipped entirely. CaseWhen
    # evaluates branches lazily (codegen emits if/else), so levenshtein
    # never runs for gap-pruned pairs. Engine-side pruning only: output
    # values are bit-identical and the DuckDB oracle is unchanged.
    # Equality fast path (round 11): identical texts — the DOMINANT
    # pair class on a dedup-heavy corpus, every exact-dup cluster pair —
    # are distance 0 by definition; one O(len) compare replaces the
    # O(len × cap) thresholded DP. On 10k-50k-char documents that DP is
    # ~5M cells per pair, so exact clusters would otherwise pay the
    # verify stage's whole budget re-proving zeros. The DuckDB oracle
    # carries the same two cheap branches, so values stay bit-identical.
    len_gap = F.abs(F.length(F.col("_ta")) - F.length(F.col("_tb")))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.when(F.col("_ta") == F.col("_tb"), F.lit(0))
            .when(len_gap > cap, F.lit(cap))
            .otherwise(F.when(lev < 0, F.lit(cap)).otherwise(lev))
            .cast("long")
            .alias("edit_dist"),
        )
    )


#: SimHash band scheme for Hamming-banded pairing: 2 bands × 26 bits
#: with 1-bit MULTIPROBE. By pigeonhole, ≤ ``2·(flips+1) − 1 = 3`` bit
#: flips split across 2 bands leave some band with ≤ 1 flip, so probing
#: each band key plus its 26 one-bit neighbours makes the banded
#: equi-join *complete* (not approximate) for Hamming ≤ 3 — the same
#: radius the previous 4 × 13-bit exact-key scheme guaranteed.
#:
#: Why multiprobe (round-9 scale gate): 13-bit keys give only 8,192
#: buckets per band, and at the 100× fixture (500k docs) the key space
#: SATURATED — measured Σ bucket² grew 50× for 10× docs (46k → 2.33M
#: joined rows; ≈ 765M projected at 100×, 222s warm), the classic
#: linear-buckets → quadratic-join onset the round-7 hyperplane bug
#: showed. 26-bit keys give 67M buckets per band, so bucket occupancy —
#: and the join — stays linear in the corpus until ~10⁸ docs per
#: partition-disjoint shard; the probe-side explode is a fixed ×27 per
#: band, a constant that buys away the quadratic term.
SIMHASH_PAIR_BANDS = 2
SIMHASH_PROBE_FLIPS = 1
#: Kept name: the completeness radius of the default scheme (= 3).
SIMHASH_NEARDUP_RADIUS = SIMHASH_PAIR_BANDS * (SIMHASH_PROBE_FLIPS + 1) - 1


def simhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = SIMHASH_NEARDUP_RADIUS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs within ``max_hamming`` bit flips.

    Pipeline: 52-bit SimHash per doc (map-only, :func:`simhash_docs`) →
    explode into ``SIMHASH_PAIR_BANDS`` 26-bit band keys, the full
    signature riding along → self-equi-join inside band buckets, with
    the SMALLER-id side additionally probing each band key's 26 one-bit
    neighbours (multiprobe) → exact Hamming via ``bit_count(xor)`` read
    off the joined row → filter ≤ ``max_hamming`` → distinct pairs.
    Output: (doc_a, doc_b, hamming), doc_a < doc_b.

    **Completeness**: for the default ``max_hamming = 3``, any qualifying
    pair has ≤ 3 flips split across 2 bands, so some band carries ≤ 1
    flip — and the 1-flip probe set covers it exactly. Banding is a
    pruning strategy, not an approximation (unlike MinHash banding,
    which is probabilistic in the signature itself). A larger
    ``max_hamming`` filters correctly but is no longer complete (same
    contract as the previous 4-band scheme beyond its radius).

    100 TB: cost is O(docs × 54 probe rows + Σ bucket_a·bucket_b) with
    26-bit keys (67M per band) keeping buckets near-singleton until
    ~10⁸ docs — the round-9 scale gate measured the previous 13-bit
    scheme going quadratic at 500k docs (see ``SIMHASH_PAIR_BANDS``).
    ``max_bucket_size`` still caps pathological buckets
    (boilerplate-heavy corpora), applied to the band rows before BOTH
    join sides derive from them; a capped doc loses that band entirely
    (membership and probes) and can still pair through its other band.
    The Hamming filter runs *inside* the join
    before the distinct, so the dedup shuffle carries only surviving
    pairs.
    """
    bands_n = SIMHASH_PAIR_BANDS
    width = SIMHASH_BITS // bands_n
    mask = (1 << width) - 1
    # The no-token sentinel (-1) exclusion is the CHEAP EQUIVALENT
    # predicate on the raw text — `lower(text) rlike '[a-z0-9]'` is
    # exactly "token set non-empty" under the [a-z0-9]+ tokenizer (NULL
    # text fails it like it fails banding) — applied BEFORE the
    # signature, never `where(simhash >= 0)` over the computed column:
    # predicate pushdown substitutes the alias into the predicate and
    # pushes the ENTIRE tokenize + 52-bit fold beneath the rebalance
    # Exchange, onto the single-row-group scan task — measured 190s
    # single-core vs 9.5s parallel for 500k docs, evaluated AGAIN above
    # the exchange (round-9 scale-gate finding; same fix as the minhash
    # twin in minhash_candidate_pairs). Semantics unchanged: contentless
    # docs must not clique with each other at hamming 0, while a
    # contentful doc with a legitimate all-zero signature still
    # participates. Oracle in lockstep.
    sh = simhash_docs(
        docs.where(F.lower(F.col(text_col)).rlike("[a-z0-9]")),
        text_col,
        id_col,
    ).select(F.col("doc_id").alias("doc"), "simhash")
    from financial_big_data_exp_4_spark.session import persist_scoped

    # persisted for the same reason as the minhash band rows: the 52-bit
    # HOF fold would otherwise run once per self-join branch.
    bands = persist_scoped(
        sh.select(
            "doc",
            "simhash",
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(
                            F.col("simhash"), b * width
                        ).bitwiseAND(F.lit(mask))
                        for b in range(bands_n)
                    ]
                )
            ).alias("band_id", "band_key"),
        )
    )
    # the bucket cap applies to the base band rows BEFORE either join
    # side derives from them: capping only the exact side would leave
    # the ×27 probe explode of an over-full bucket's members uncapped —
    # a 100k-doc degenerate bucket with cap 1000 would still push 100k
    # identity probes into the 1000 surviving exact rows (~1e8 joined
    # rows THROUGH the guard), and a capped doc could sneak back into
    # pairing through the same band as the probe side (round-9 review).
    # Capping the base keeps the previous semantics: a doc in an
    # over-full bucket loses that band entirely — membership AND probes —
    # and can still pair through its other band.
    bands = _cap_band_buckets(bands, max_bucket_size)
    exact = bands
    # probe side: the band key itself plus its `width` one-bit flips.
    # Flips are symmetric (xor), so probing only one join side suffices;
    # anchoring the probe side as the smaller doc id (the a.doc < b.doc
    # join bound) keeps every qualifying pair reachable exactly once per
    # matching band, and DISTINCT collapses the ≤ bands_n multiplicity.
    probes = bands.select(
        "doc",
        "simhash",
        "band_id",
        F.explode(
            F.array(
                F.col("band_key"),
                *[
                    F.col("band_key").bitwiseXOR(F.lit(1 << j))
                    for j in range(width)
                ],
            )
        ).alias("band_key"),
    )
    a, b = probes.alias("a"), exact.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )


def word_bigrams(text: Column | str) -> Column:
    """Distinct word-bigram strings ('tok1 tok2'); [] for < 2 tokens.

    The ``when`` guard matters: an empty token array would feed
    ``slice(toks, 1, -1)``, and a negative slice length fails the job
    (for exactly one token the unguarded path is benign — length-0
    slices zip to []).
    """
    toks = tokenize(text)
    n = F.size(toks)
    # zip_with over two shifted slices, not element_at over an index
    # sequence: the indexed form re-evaluates the (inlined) tokenize
    # expression per element lookup inside the interpreted lambda —
    # measured 14× slower at sf0.1 (4.0s → 0.28s for this projection).
    grams = F.array_distinct(
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    )
    return F.when(n >= 2, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_jaccard_adjacent(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Word-bigram Jaccard similarity between id-adjacent documents
    (doc d vs doc d+1) — a linear, key-joined demonstration of the n-gram
    Jaccard operator (the general pair source is the LSH candidates from
    :func:`minhash_candidate_pairs`; all-pairs is never materialized).
    """
    from financial_big_data_exp_4_spark.session import (
        persist_scoped,
        rebalance_for_cpu,
    )

    docs = rebalance_for_cpu(docs, id_col)
    # persisted (scoped): both self-join branches read the bigram
    # projection, and Spark shares no scans between branches — the
    # tokenize+zip_with bigram expression is the dominant map cost and
    # would otherwise run once per branch
    g = persist_scoped(docs.select(
        F.col(id_col).alias("doc"),
        # materialized join key: `a.doc + 1 == b.doc` as a raw condition is
        # not recognized as an equi-join and planned as a nested-loop join
        # (observed: 250k-pair cartesian at 500 docs); a column-to-column
        # key makes it a hash/sort-merge join.
        (F.col(id_col) + 1).alias("next_doc"),
        word_bigrams(text_col).alias("grams"),
    ))
    a, b = g.alias("a"), g.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    return (
        a.join(b, F.col("a.next_doc") == F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            inter.cast("long").alias("n_common"),
            union.cast("long").alias("n_union"),
            F.when(union > 0, inter.cast("double") / union.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
    )


def apply_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: Sequence[str] = ("lang", "n_chars"),
) -> DataFrame:
    """The *apply* step of exact dedup: the kept corpus itself — one full
    row per distinct text (the min-id copy), not just the digest table.

    Aggregate-then-join, never a window: the keeper table
    (digest → min id) reduces map-side before its shuffle, then joins
    back on the digest. A window/row_number formulation computes the same
    rows but shuffles and sorts every full-payload row; here the payload
    rows move through the join hash-partitioned once and the *aggregate*
    shuffle carries only (digest, id) pairs. ``keep_cols`` is the payload
    carried for kept rows (default = the fixture's columns; any input
    schema works). Output: (doc_id, *keep_cols).
    """
    digest = F.md5(F.col(text_col)).alias("_digest")
    keepers = (
        docs.select(digest, F.col(id_col))
        .groupBy("_digest")
        .agg(F.min(id_col).alias("_keep_id"))
    )
    return (
        docs.select(digest, id_col, *keep_cols)
        .join(keepers, "_digest")
        .where(F.col(id_col) == F.col("_keep_id"))
        .select(id_col, *keep_cols)
    )


#: Minimum exact word-bigram Jaccard for an LSH candidate pair to be
#: confirmed a near-duplicate (the precision pass; LSH banding is the
#: recall pass).
NEARDUP_VERIFY_THRESHOLD = 0.5


def neardup_verified_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = NEARDUP_VERIFY_THRESHOLD,
    pairs: DataFrame | None = None,
    hint_broadcast: bool = True,
) -> DataFrame:
    """LSH candidates confirmed by *exact* n-gram Jaccard — the full
    recall-then-precision near-dup pipeline (band join proposes, exact
    similarity disposes; the confirmed pairs are what clustering should
    consume when false-positive cost matters).

    The exact comparison runs ONLY on candidate pairs (O(|candidates|),
    never all-pairs): docs are first pruned to candidate participants
    (broadcast semi-join, :func:`_prune_to_participants`) so the bigram
    map work and both hash joins touch |participants| rows, not the full
    corpus. Output: (doc_a, doc_b, jaccard), jaccard ≥ threshold.
    """
    from financial_big_data_exp_4_spark.session import (
        persist_scoped,
        rebalance_for_cpu,
    )

    if pairs is None:
        # see neardup_edit_distance: candidate plan feeds two consumers
        pairs = persist_scoped(
            minhash_candidate_pairs(docs, text_col, id_col)
        )
    cand = pairs.select("doc_a", "doc_b")
    # rebalance BEFORE the prune: rebalance_for_cpu probes the input's
    # partition count via .rdd, and on a join plan that probe eagerly
    # executes the candidate/broadcast stages at query-BUILD time under
    # AQE (observed: 3 jobs fired before any action); on the bare scan
    # it plans nothing. The semi-join then runs map-side on the
    # fanned-out partitions, so the pruned rows stay spread.
    pruned = _prune_to_participants(
        rebalance_for_cpu(docs, id_col), cand, id_col,
        hint_broadcast=hint_broadcast,
    )
    grams = pruned.select(
        F.col(id_col).alias("_gdoc"), word_bigrams(text_col).alias("_grams")
    )
    a = grams.select(
        F.col("_gdoc").alias("doc_a"), F.col("_grams").alias("_ga")
    )
    b = grams.select(
        F.col("_gdoc").alias("doc_b"), F.col("_grams").alias("_gb")
    )
    inter = F.size(F.array_intersect(F.col("_ga"), F.col("_gb")))
    union = F.size(F.array_union(F.col("_ga"), F.col("_gb")))
    jac = F.when(
        union > 0, inter.cast("double") / union.cast("double")
    ).otherwise(F.lit(0.0))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


#: Bloom membership parameters: bits per corpus key and hash count.
#: FP rate for r bits/key with k hashes is (1 − e^{−k/r})^k — r=10,
#: k=4 → ≈1.2%, the standard ingest-prefilter operating point. The bit
#: array is stored as 63-bit WORDS (never the sign bit: DuckDB raises
#: on a BIGINT 1<<63 overflow where Spark wraps — 63 keeps the word
#: arithmetic identical on both engines), so m is rounded up to a
#: multiple of 63.
BLOOM_BITS_PER_KEY = 10
BLOOM_HASHES = 4


def _bloom_pos(h_md5: Column, i: int, m: int) -> Column:
    """Position of hash #i in an m-bit Bloom filter via Kirsch-
    Mitzenmacher double hashing (pos_i = h1 + i·h2 mod m — two hashes
    give k independent-enough probes; public result): h1/h2 are the two
    52-bit halves of one md5, the repo's standard cross-engine hash
    idiom (oracle parses the same hex digits). Max intermediate
    h1 + 3·h2 < 2^54 — no 64-bit overflow on either engine."""
    h1 = F.conv(F.substring(h_md5, 1, 13), 16, 10).cast("long")
    h2 = F.conv(F.substring(h_md5, 14, 13), 16, 10).cast("long")
    return F.pmod(h1 + F.lit(i) * h2, F.lit(m))


def bloom_words(
    corpus_md5: DataFrame, m: int, md5_col: str = "_h"
) -> DataFrame:
    """Build an m-bit Bloom filter over a corpus digest column as a
    DATAFRAME of 63-bit words: (word_idx, word) where ``word`` is the
    bit_or of every set bit in that word.

    This is the Spark-native Bloom (Spark's internal bloom_filter_agg /
    might_contain are not in the public function registry): the build is
    one explode(k)+groupBy over the corpus — fully partial-aggregable,
    map-side combined — and the RESULT is ⌈m/63⌉ rows × 16 bytes. At
    10 bits/key even a 10-billion-key corpus filter is ~1.6 GB of rows:
    join-able by word_idx at worst, broadcastable after the usual
    per-partition OR-compaction, and a one-off artifact a production
    ingest pipeline persists next to the corpus (like the IVF index).
    NULL digests contribute no bits.

    The null-guard is skipped when the input schema already proves the
    digest non-nullable: otherwise Catalyst pushes the inferred
    ``IsNotNull(md5(text))`` below the digest projection into the scan
    Filter and the corpus pays the hash TWICE per row (caught by
    tools/explain_audit.py). Callers that pre-filter the raw text can
    assert that via a non-nullable digest expression (see
    bloom_prefilter_proof)."""
    if corpus_md5.schema[md5_col].nullable:
        corpus_md5 = corpus_md5.where(F.col(md5_col).isNotNull())
    pos = F.explode(
        F.array(
            *[
                _bloom_pos(F.col(md5_col), i, m)
                for i in range(BLOOM_HASHES)
            ]
        )
    ).alias("_pos")
    return (
        corpus_md5.select(pos)
        # integer DIV, not float division + cast: a double quotient can
        # land an ulp under the true integer at large m and truncate to
        # the wrong word on one engine only
        .groupBy(F.expr("_pos DIV 63").alias("word_idx"))
        .agg(F.bit_or(F.expr("shiftleft(1L, int(_pos % 63))")).alias("word"))
    )


def bloom_membership(
    probes: DataFrame,
    words: DataFrame,
    m: int,
    id_col: str = "doc_id",
    md5_col: str = "_h",
) -> DataFrame:
    """Probe an m-bit Bloom word table: per probe row, TRUE iff every
    one of its k bits is set. Plan shape: explode(k) over the probe
    batch, join the word table on word_idx — explicitly BROADCAST while
    the filter fits the session's broadcast threshold (the common case:
    m/63 × 16 B rows), plain equi-join above it (a 10-bits/key filter
    over 10^10+ keys is GBs of words; forcing that through the driver
    is exactly the failure the threshold exists to prevent) — then one
    bool_and aggregate back to one row per probe. The corpus itself is
    never touched, which is the entire point of the prefilter at
    ingest. A word_idx no corpus key ever lit has no row: the left
    join's NULL word reads as bit-not-set. NULL digests (NULL text
    upstream) are definitionally non-members."""
    from financial_big_data_exp_4_spark.operators.skew import (
        _broadcast_threshold_bytes,
    )

    # 16 B/row planner-grade estimate; word count is the hard cap m/63
    if (m // 63) * 16 <= _broadcast_threshold_bytes(probes.sparkSession):
        words = F.broadcast(words)
    pairs = probes.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    _bloom_pos(F.col(md5_col), i, m)
                    for i in range(BLOOM_HASHES)
                ]
            )
        ).alias("_i", "_pos"),
    ).select(
        id_col,
        F.expr("_pos DIV 63").alias("word_idx"),
        F.expr("shiftleft(1L, int(_pos % 63))").alias("_mask"),
    )
    hit = (
        pairs.join(words, "word_idx", "left")
        .groupBy(id_col)
        .agg(
            F.min(
                F.coalesce(
                    F.col("word").bitwiseAND(F.col("_mask"))
                    == F.col("_mask"),
                    F.lit(False),
                )
            ).alias("bloom_hit")
        )
    )
    return probes.select(id_col).join(hit, id_col, "left").select(
        id_col, F.coalesce(F.col("bloom_hit"), F.lit(False)).alias("bloom_hit")
    )


def bloom_words_size(n_keys: int, bits_per_key: int = BLOOM_BITS_PER_KEY) -> int:
    """m for a corpus of n keys, rounded UP to a whole number of 63-bit
    words (≥ 63 so a degenerate empty/near-empty corpus still builds a
    valid filter). Deterministic from the count, so the SQL oracle
    computes the identical m via a scalar subquery."""
    words = max(1, -(-(n_keys * bits_per_key) // 63))
    return words * 63


def bloom_corpus_split(
    docs: DataFrame, split_mod: int = 37
) -> tuple[DataFrame, DataFrame]:
    """The Bloom proof's deterministic corpus/batch split: corpus =
    (doc_id % mod ≠ 0, non-NULL text) with a provably non-nullable
    digest, batch = (doc_id % mod = 0) with the raw nullable digest.
    Shared by the proof and the memoized word-table builder so the two
    can never disagree on membership."""
    base = docs.select("doc_id", F.md5("text").alias("_h"))
    # Corpus digests: pre-filter NULL text on the raw column (the cheap
    # equivalent of IsNotNull(md5(text))) and mark the digest
    # non-nullable via coalesce-with-literal — an identity here, but it
    # lets bloom_words skip its null-guard so the scan hashes each row
    # exactly once (explain_audit's md5-in-Filter rule).
    corpus = docs.where(
        (F.col("doc_id") % split_mod != 0) & F.col("text").isNotNull()
    ).select(
        "doc_id", F.coalesce(F.md5("text"), F.lit("")).alias("_h")
    )
    return corpus, base.where(F.col("doc_id") % split_mod == 0)


def bloom_prefilter_proof(
    docs: DataFrame,
    split_mod: int = 37,
    words_m: tuple[DataFrame, int] | None = None,
) -> DataFrame:
    """Declared-surface composition: split documents into corpus
    (doc_id % mod ≠ 0) and incoming batch (doc_id % mod = 0), build the
    Bloom over corpus text digests, probe the batch, and emit per batch
    doc: (doc_id, bloom_hit, exact_hit, no_false_negative).

    ``words_m`` supplies a prebuilt ``(word table, m)`` — the
    session-memoized artifact path (the filter is a one-off a
    production ingest pipeline persists next to the corpus, so serving
    it is the realistic shape; the default rebuilds inline).

    ``exact_hit`` is the ground-truth md5 semi-join; ``no_false_negative``
    (bloom_hit OR NOT exact_hit) is the Bloom contract made row-wise
    falsifiable — a Bloom may over-admit (bounded FPs the FP-rate knob
    prices) but NEVER under-admit, so the oracle expects TRUE on every
    row while bloom_hit itself is hash-compared bit-for-bit (the filter
    is deterministic given the digests). NULL-text rows: excluded from
    the corpus bits; as probes they are non-members by contract."""
    corpus, batch = bloom_corpus_split(docs, split_mod)
    if words_m is None:
        m = bloom_words_size(corpus.count())
        words = bloom_words(corpus, m)
    else:
        words, m = words_m
    flags = bloom_membership(batch, words, m)
    exact = (
        batch.join(
            corpus.select(F.col("_h").alias("_ch")).distinct(),
            F.col("_h") == F.col("_ch"),
            "left",
        )
        .groupBy("doc_id")
        .agg(F.max(F.col("_ch").isNotNull()).alias("exact_hit"))
    )
    return (
        flags.join(exact, "doc_id")
        .select(
            "doc_id",
            "bloom_hit",
            "exact_hit",
            (F.col("bloom_hit") | ~F.col("exact_hit")).alias(
                "no_false_negative"
            ),
        )
    )
