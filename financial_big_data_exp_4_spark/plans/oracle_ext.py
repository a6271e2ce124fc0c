"""DuckDB oracle SQL for the extension queries — generated from the SAME
constants the Spark operators use (minhash coefficients, stopword lists,
shingle width), so the two sides cannot drift independently.

Mirroring rules (same as :mod:`.oracle`):
* identical expression trees and evaluation order for every double value
  (sequential ``list_reduce`` fold == Spark's ``aggregate`` fold);
* the 52-bit md5 hash is parsed hex-digit-by-hex-digit via
  ``list_reduce`` (DuckDB has no hex→int builtin) — bit-identical to
  Spark's ``conv(substring(md5(x),1,13),16,10)``;
* all counts/sizes BIGINT on both sides; division-by-zero guarded with
  the same CASE conditions;
* every DECIMAL→DOUBLE conversion routes through VARCHAR
  (``CAST(CAST(x AS VARCHAR) AS DOUBLE)``): DuckDB's direct
  decimal/int128→double conversion is NOT correctly rounded (observed:
  an exact 6634783729228.8365 converts to ...837 where the correctly
  rounded double is ...836 — Spark's BigDecimal path), while its
  string→double parse IS correctly rounded, restoring bit-identity
  (found by tools/fuzz_correctness.py on a 17-digit moment sum).

``q_multimodal_meta`` has an oracle despite running through
``mapInPandas``: its pandas transform is closed-form (md5 + arithmetic on
byte length), which is exactly what makes the binary plumbing testable.
"""

from __future__ import annotations

from financial_big_data_exp_4_spark.functions.core import det_hash_mod_sql
from financial_big_data_exp_4_spark.operators.dedup import (
    EDIT_DISTANCE_CAP,
    MINHASH_BANDS,
    MINHASH_COEFFS,
    MINHASH_P,
    MINHASH_ROWS_PER_BAND,
    SHINGLE_K,
    SHINGLE_SELECT_MOD,
    SIMHASH_BITS,
)
from financial_big_data_exp_4_spark.operators.similarity import (
    IVF_TOPK,
    NEARDUP_COS_THRESHOLD,
    TOPK,
)
from financial_big_data_exp_4_spark.operators.corpus import (
    BM25_B,
    BM25_K1,
    BM25_QUERY_TERMS,
    BM25_TOP_K,
    CHUNK_OVERLAP,
    CHUNK_WIDTH,
    EVENT_SAMPLE_RATES,
    INDEX_MAX_POSTINGS,
    PACK_BUDGET,
    PACK_CHUNK,
    QF_MAX_MEAN_LEN,
    QF_MAX_SYMBOL_RATIO,
    QF_MAX_WORDS,
    QF_MIN_MEAN_LEN,
    QF_MIN_WORDS,
    TFIDF_TOP_K,
)
from financial_big_data_exp_4_spark.operators.similarity import (  # noqa: E402
    LSH_DIM,
    LSH_PLANES,
    _lsh_weight_sql,
)
from financial_big_data_exp_4_spark.operators.joins import (
    LARGE_ORDER_THRESHOLD,
    US_PER_HOUR,
)
from financial_big_data_exp_4_spark.operators.text import (
    BPE_TOKEN_RE,
    FINGERPRINT_K,
    FINGERPRINT_STRIDE,
    LANG_PROFILES,
    PII_EMAIL,
    PII_PHONE,
    QUALITY_STOPWORDS,
)

TOKENIZE = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _rate_cases() -> str:
    """``WHEN 'stratum' THEN rate`` arms for the stratified-sample CASE —
    generated from the same rate map the Spark operator uses."""
    return " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in sorted(EVENT_SAMPLE_RATES.items())
    )


def _md5int(expr: str) -> str:
    """52-bit int from the first 13 hex digits of md5 — Spark parity."""
    return _hex13int(f"md5({expr})")


def _hex13int(mexpr: str) -> str:
    """First 13 hex chars of an already-computed md5 string → BIGINT.

    DuckDB's VARCHAR→BIGINT cast accepts ``0x``-prefixed hex — a native
    scalar parse. The previous rendering folded a per-row 13-element
    list (``list_transform`` + ``list_reduce`` of ``strpos`` digits):
    value-identical (property-checked over 200k md5s), but the per-row
    list allocation dominated the md5-heavy oracles on the longdocs
    fixture — the fingerprint oracle alone ran 88 s for ~7.5M hashes;
    the cast form is ~8× cheaper. Engine parity is unchanged: Spark
    computes the same value as ``conv(substring(md5(x), 1, 13), 16,
    10)``.
    """
    return f"CAST('0x' || substr({mexpr}, 1, 13) AS BIGINT)"


def _shingle_hashes(k: int = SHINGLE_K, mod: int = SHINGLE_SELECT_MOD) -> str:
    """Distinct 52-bit hashes of content-anchored k-char shingles of
    ``text`` — md5 computed once per selected shingle, parsed from the
    cached string. Selection mirrors operators.dedup.shingle_hash_set
    exactly: positions whose first character has an even code point,
    falling back to ALL positions when no position anchors (keeps
    ``shingle set non-empty ⟺ len(text) ≥ k`` exact on both engines)."""
    sel = (
        f"list_filter(generate_series(1, len(text) - {k - 1}), "
        f"si -> ascii(substr(text, si, 1)) % {mod} = 0)"
    )
    anchored = (
        f"CASE WHEN len({sel}) > 0 THEN {sel} "
        f"ELSE generate_series(1, len(text) - {k - 1}) END"
    )
    return (
        f"CASE WHEN len(text) >= {k} THEN "
        "list_distinct(list_transform("
        f"list_transform({anchored}, "
        f"si -> md5(substr(text, si, {k}))), m -> {_hex13int('m')})) "
        "ELSE [] END"
    )


def _sql_list(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# -- dedup ------------------------------------------------------------------

Q_DEDUP_EXACT = """
    SELECT md5(text) AS text_md5,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
"""

_TH_MOD_P = (
    f"list_transform({_shingle_hashes()}, hh -> hh % {MINHASH_P})"
)


def _th_table_sql(src: str) -> str:
    """``(doc, th)`` — per-document anchored shingle hashes mod P, in
    ROW form: positions unnested to rows, shingles cut with DuckDB's
    *vectorized* ``substr`` (which has the fast path the list-lambda
    path lacks), grouped back per doc. Value-identical to the
    expression form ``SELECT doc_id AS doc, {{_TH_MOD_P}} AS th`` —
    same anchor selection (first char's code point even), same
    no-anchor fallback to all positions, same empty list for
    ``len(text) < k`` / NULL text; the only representational change is
    that distinctness is taken on the 52-bit ints rather than the md5
    strings, which can only drop post-truncation duplicates and every
    consumer folds ``th`` through ``list_min`` (round-11 measurement:
    the lambda form's per-position ``substr`` made the oracle O(len²)
    per document — 59 s for just 100 docs × 32k chars vs 1.0 s in row
    form — which priced the longdocs differential gate out entirely).

    The k-char shingle is CUT in the projection directly over the
    unnest, so the anchored-fallback window (``bool_or OVER doc_id``)
    materializes only (doc_id, k-char shingle, flag) rows. The first
    row-form draft carried the full ``text`` column into the window
    operator, which duplicates the document once PER POSITION at
    materialization — ~15M rows × ~30k chars ≈ 100-GB-scale spill on
    the longdocs fixture; one consuming oracle ran >10 min and the ~8
    consumers pushed the longdocs gate past a 1 h timeout (round-11
    session 2). The anchor test reads the shingle's own first char —
    identical to testing the text at the shingle's position.
    """
    k = SHINGLE_K
    return f"""
        SELECT d.doc_id AS doc,
               coalesce(s.th, CAST([] AS BIGINT[])) AS th
        FROM {src} d
        LEFT JOIN (
            SELECT doc_id,
                   list_transform(list(DISTINCT {_hex13int('m')}),
                                  hh -> hh % {MINHASH_P}) AS th
            FROM (
                SELECT q.doc_id, md5(q.sh) AS m
                FROM (
                    SELECT r.doc_id, r.sh,
                           ascii(substr(r.sh, 1, 1))
                               % {SHINGLE_SELECT_MOD} = 0 AS anch,
                           bool_or(ascii(substr(r.sh, 1, 1))
                               % {SHINGLE_SELECT_MOD} = 0)
                               OVER (PARTITION BY r.doc_id) AS has_anch
                    FROM (
                        SELECT p.doc_id,
                               substr(p.text, p.si, {k}) AS sh
                        FROM (
                            SELECT doc_id, text,
                                   unnest(generate_series(
                                       1, len(text) - {k - 1})) AS si
                            FROM {src} WHERE len(text) >= {k}
                        ) p
                    ) r
                ) q
                WHERE q.anch OR NOT q.has_anch
            )
            GROUP BY doc_id
        ) s ON d.doc_id = s.doc_id
    """

_MH_EXPRS = ",\n           ".join(
    f"coalesce(list_min(list_transform(th, h -> (h * {a} + {b}) % "
    f"{MINHASH_P})), {MINHASH_P}) AS mh_{i}"
    for i, (a, b) in enumerate(MINHASH_COEFFS)
)

# WHERE mh_0 < P: a document shorter than one shingle carries the
# all-sentinel signature (every mh_i = P); banding those would put ALL
# short docs in one bucket (an O(n_short^2) false-candidate clique), so
# they are excluded from pairing on BOTH engine and oracle sides.
_BAND_SELECTS = "\n        UNION ALL ".join(
    ("SELECT doc, {b} AS band_id, {key} AS band_key FROM sig"
     " WHERE mh_0 < " + str(MINHASH_P)).format(
        b=b,
        key=" || ',' || ".join(
            f"CAST(mh_{j} AS VARCHAR)"
            for j in range(
                b * MINHASH_ROWS_PER_BAND, (b + 1) * MINHASH_ROWS_PER_BAND
            )
        ),
    )
    for b in range(MINHASH_BANDS)
)

_AGREE = " + ".join(
    f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END"
    for i in range(len(MINHASH_COEFFS))
)

# AS MATERIALIZED (purely physical, values unchanged): DuckDB INLINES
# plain CTEs per reference, and ``sig`` is referenced 6× here (4 band
# branches + both signature joins), ``bands`` twice (the self-join) —
# inlined, the md5-heavy signature pipeline ran 6× per consuming oracle
# (190 s on the longdocs fixture; ~25 s materialized). Consumers that
# reference the whole pair CTE twice (the CC / two-star oracles) re-run
# only the final cheap pairs join — the heavy stages materialize once.
Q_NEARDUP_MINHASH = f"""
    WITH th_t AS MATERIALIZED (
        {_th_table_sql("documents")}
    ), sig AS MATERIALIZED (
        SELECT doc,
           {_MH_EXPRS}
        FROM th_t
    ), bands AS MATERIALIZED (
        {_BAND_SELECTS}
    ), pairs AS (
        SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
        FROM bands x JOIN bands y
          ON x.band_id = y.band_id AND x.band_key = y.band_key
         AND x.doc < y.doc
    )
    SELECT p.doc_a, p.doc_b,
           CAST({_AGREE} AS DOUBLE) / {float(len(MINHASH_COEFFS))}
               AS est_jaccard
    FROM pairs p
    JOIN sig sa ON p.doc_a = sa.doc
    JOIN sig sb ON p.doc_b = sb.doc
"""

_TH_RAW = (
    "list_distinct(list_transform("
    f"list_transform({TOKENIZE}, t -> md5(t)), m -> {_hex13int('m')}))"
)

# Token-less docs get the out-of-domain sentinel -1 (real signatures are
# in [0, 2^52)) — engine in lockstep (operators/dedup.py _SIMHASH_EXPR).
Q_DEDUP_SIMHASH = f"""
    SELECT doc_id,
           CASE WHEN coalesce(len(th), 0) = 0 THEN CAST(-1 AS BIGINT)
           ELSE CAST(coalesce(list_sum(list_transform(
               generate_series(0, {SIMHASH_BITS - 1}), bb ->
               CASE WHEN coalesce(list_sum(list_transform(th, h ->
                        ((h // CAST(pow(2, bb) AS BIGINT)) % 2) * 2 - 1)), 0) > 0
                    THEN CAST(pow(2, bb) AS BIGINT) ELSE 0 END)), 0)
           AS BIGINT) END AS simhash
    FROM (SELECT doc_id, {_TH_RAW} AS th FROM documents)
"""

# WHERE simhash >= 0: excludes only the no-token sentinel (-1) — pairing
# contentless docs would clique them at hamming 0, but a contentful doc
# with a legitimate all-zero signature still participates.
_SH_BANDS = "\n        UNION ALL ".join(
    f"SELECT doc_id AS doc, simhash, {b} AS band_id, "
    f"(simhash >> {b * (SIMHASH_BITS // 4)}) & "
    f"{(1 << (SIMHASH_BITS // 4)) - 1} AS band_key FROM sh WHERE simhash >= 0"
    for b in range(4)
)

#: Hamming-banded SimHash pairing: 4 bands of 13 bits — pigeonhole-complete
#: for Hamming ≤ 3 (operators/dedup.py simhash_neardup_pairs).
Q_SIMHASH_NEARDUP = f"""
    WITH sh AS MATERIALIZED ({Q_DEDUP_SIMHASH}
    ), bands AS MATERIALIZED (
        {_SH_BANDS}
    )
    SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b,
           CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
    FROM bands x JOIN bands y
      ON x.band_id = y.band_id AND x.band_key = y.band_key
     AND x.doc < y.doc
    WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
"""

_GRAMS = (
    "CASE WHEN len(toks) >= 2 THEN "
    "list_distinct(list_transform(generate_series(1, len(toks) - 1), "
    "gi -> toks[gi] || ' ' || toks[gi + 1])) "
    "ELSE [] END"
)

Q_NGRAM_JACCARD = f"""
    WITH g AS (
        SELECT doc_id AS doc, {_GRAMS} AS grams
        FROM (SELECT doc_id, {TOKENIZE} AS toks FROM documents)
    )
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS n_common,
           CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS BIGINT)
               AS n_union,
           CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0
                THEN CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                     / CAST(len(list_distinct(list_concat(a.grams, b.grams)))
                            AS DOUBLE)
                ELSE 0.0 END AS jaccard
    FROM g a JOIN g b ON a.doc + 1 = b.doc
"""

# -- similarity -------------------------------------------------------------


def _dot(x: str, y: str) -> str:
    """Sequential left fold — matches Spark's aggregate(zip_with(...))."""
    return (
        f"list_reduce(list_transform(generate_series(1, len({x})), di -> "
        f"CAST({x}[di] AS DOUBLE) * CAST({y}[di] AS DOUBLE)), "
        "(acc, v) -> acc + v)"
    )


def _cos(x: str, y: str) -> str:
    return (
        f"({_dot(x, y)} / (sqrt({_dot(x, x)}) * sqrt({_dot(y, y)})))"
    )


Q_EMBED_COSINE_TOPK = f"""
    WITH probes AS (
        SELECT vec_id AS probe_id, embedding AS pv
        FROM embeddings WHERE vec_id < 5
    ), scored AS (
        SELECT p.probe_id, e.vec_id,
               {_cos('p.pv', 'e.embedding')} AS cos_sim
        FROM embeddings e, probes p
        WHERE e.vec_id <> p.probe_id
    ), ranked AS (
        SELECT probe_id, vec_id, cos_sim,
               CAST(row_number() OVER (
                   PARTITION BY probe_id
                   ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank
        FROM scored
    )
    SELECT probe_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= {TOPK}
"""

Q_EMBED_ANN_IVF = f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cv
        FROM embeddings
        WHERE vec_id % (SELECT greatest(1,
            CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM embeddings) = 0
    ), assigned AS (
        SELECT vec_id, embedding, cell FROM (
            SELECT e.vec_id, e.embedding, c.cent_id AS cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_cos('e.embedding', 'c.cv')} DESC,
                                c.cent_id ASC) AS rn
            FROM embeddings e, cents c
        ) WHERE rn = 1
    ), probes AS (
        SELECT vec_id AS probe_id, embedding AS pv, cell AS pcell
        FROM assigned WHERE vec_id < 5
    ), scored AS (
        SELECT p.probe_id, a.vec_id,
               {_cos('p.pv', 'a.embedding')} AS cos_sim
        FROM assigned a JOIN probes p ON a.cell = p.pcell
        WHERE a.vec_id <> p.probe_id
    ), ranked AS (
        SELECT probe_id, vec_id, cos_sim,
               CAST(row_number() OVER (
                   PARTITION BY probe_id
                   ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank
        FROM scored
    )
    SELECT probe_id, vec_id, cos_sim, rank FROM ranked
    WHERE rank <= {IVF_TOPK}
"""

Q_EMBED_NEARDUP = f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cv
        FROM embeddings
        WHERE vec_id % (SELECT greatest(1,
            CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM embeddings) = 0
    ), assigned AS (
        SELECT vec_id, embedding, cell FROM (
            SELECT e.vec_id, e.embedding, c.cent_id AS cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_cos('e.embedding', 'c.cv')} DESC,
                                c.cent_id ASC) AS rn
            FROM embeddings e, cents c
        ) WHERE rn = 1
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_cos('a.embedding', 'b.embedding')} AS cos_sim
    FROM assigned a JOIN assigned b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE {_cos('a.embedding', 'b.embedding')} >= {NEARDUP_COS_THRESHOLD}
"""

# -- text -------------------------------------------------------------------

Q_TOKEN_COUNT = rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text),
                    '{BPE_TOKEN_RE}')) AS BIGINT) AS bpe_tokens
    FROM documents
"""

Q_TEXT_QUALITY = f"""
    WITH f AS (
        SELECT doc_id,
               CAST(len(text) AS BIGINT) AS n_chars,
               {TOKENIZE} AS toks,
               CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))
                    AS BIGINT) AS n_punct,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
                    AS n_digit
        FROM documents
    ), g AS (
        SELECT doc_id, n_chars, n_punct, n_digit,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               coalesce(list_sum(list_transform(toks, tt ->
                   CAST(len(tt) AS BIGINT))), 0) AS tok_chars,
               CAST(len(list_intersect(list_distinct(toks),
                    {_sql_list(QUALITY_STOPWORDS)})) AS BIGINT) AS n_stop,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
        FROM f
    )
    SELECT doc_id, n_chars, n_tokens,
           CASE WHEN n_tokens > 0
                THEN CAST(tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                ELSE 0.0 END AS mean_token_len,
           CASE WHEN n_chars > 0
                THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)
                ELSE 0.0 END AS punct_ratio,
           CASE WHEN n_chars > 0
                THEN CAST(n_digit AS DOUBLE) / CAST(n_chars AS DOUBLE)
                ELSE 0.0 END AS digit_ratio,
           CASE WHEN n_distinct > 0
                THEN CAST(n_stop AS DOUBLE) / CAST(n_distinct AS DOUBLE)
                ELSE 0.0 END AS stopword_ratio,
           least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
           + (CASE WHEN n_distinct > 0
                   THEN CAST(n_stop AS DOUBLE) / CAST(n_distinct AS DOUBLE)
                   ELSE 0.0 END) * 0.3
           + (1.0 - CASE WHEN n_chars > 0
                         THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)
                         ELSE 0.0 END) * 0.2 AS quality_score
    FROM g
"""

_LANGS = sorted(LANG_PROFILES)
_SCORE_EXPRS = ",\n               ".join(
    f"CAST(len(list_intersect(dt, {_sql_list(LANG_PROFILES[lang])})) "
    f"AS BIGINT) AS s_{lang}"
    for lang in _LANGS
)
_BEST = "greatest(" + ", ".join(f"s_{lang}" for lang in _LANGS) + ")"
_PRED_CASE = (
    "CASE "
    + " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in _LANGS)
    + " END"
)

Q_LANG_ID = f"""
    WITH s AS (
        SELECT doc_id, lang,
               {_SCORE_EXPRS}
        FROM (SELECT doc_id, lang, list_distinct({TOKENIZE}) AS dt
              FROM documents)
    ), b AS (
        SELECT doc_id, lang, {_BEST} AS best,
               {", ".join(f"s_{lang}" for lang in _LANGS)}
        FROM s
    )
    SELECT doc_id, lang, {_PRED_CASE} AS lang_pred, best AS lang_score
    FROM b
"""

#: Row form for the same reason as _th_table_sql: per-position substr
#: inside a list lambda is O(len²) per doc on long documents, while the
#: unnested vectorized substr path is linear. min/count over the rows
#: ≡ list_min/list_filter-len over the array; docs shorter than K (or
#: NULL text) fall out of the unnest and re-enter via the LEFT JOIN as
#: (NULL min, 0 selected) — exactly the expression form's [] semantics.
Q_DOC_FINGERPRINT = f"""
    WITH h AS (
        SELECT doc_id, {_hex13int(f"md5(substr(text, si, {FINGERPRINT_K}))")}
                   AS fh
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(1, len(text) - {FINGERPRINT_K - 1},
                                          {FINGERPRINT_STRIDE})) AS si
            FROM documents WHERE len(text) >= {FINGERPRINT_K}
        )
    ), agg AS (
        SELECT doc_id,
               min(fh) AS min_shingle_hash,
               CAST(sum(CASE WHEN fh % 16 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_selected
        FROM h GROUP BY doc_id
    )
    SELECT d.doc_id,
           a.min_shingle_hash,
           CAST(coalesce(a.n_selected, 0) AS BIGINT) AS n_selected
    FROM documents d
    LEFT JOIN agg a ON d.doc_id = a.doc_id
"""

# -- events -----------------------------------------------------------------


def duck_floor_div(expr: str, n: int) -> str:
    """Integer FLOOR division (toward −∞) as a DuckDB expression —
    the oracle-side twin of the engine's ``floor_div_sql``.

    DuckDB's integer ``//`` TRUNCATES toward zero (``-7 // 2 = -3``),
    exactly like Spark's bare ``DIV`` — the earlier assumption that it
    floors was wrong and only held because the driver fixture has no
    pre-epoch timestamps (every negative-bucket row diverged by one
    width; found by ``tools/fuzz_correctness.py``). ``a − posmod(a, n)``
    is exactly divisible by ``n``, all in BIGINT — no double round-trip.
    """
    return f"((({expr}) - ((({expr}) % {n} + {n}) % {n})) // {n})"


#: epoch-µs floor-buckets shared by every events oracle below
_FD_SEC = duck_floor_div("epoch_us(ts)", 1_000_000)
_FD_HOUR = duck_floor_div("epoch_us(ts)", 3_600_000_000)
_FD_DAY = duck_floor_div("epoch_us(ts)", 86_400_000_000)

Q_TUMBLING_WINDOW = f"""
    SELECT CAST({_FD_HOUR} AS BIGINT) * 3600
               AS window_start_s,
           event_type,
           count(*) AS cnt
    FROM events
    GROUP BY 1, 2
"""

#: Hopping windows (width 1 h, hop 30 min): the window containing t with
#: start ≡ j·hop (mod width) starts at floor((t − j·hop)/width)·width
#: + j·hop; the cross join over j = 0, 1 enumerates each event's two
#: windows — the exact mirror of operators/events.py:hopping_counts.
Q_HOPPING_WINDOW = f"""
    SELECT CAST({duck_floor_div(
        "epoch_us(ts) - j * 1800000000", 3_600_000_000)} AS BIGINT) * 3600
               + j * 1800 AS window_start_s,
           event_type,
           count(*) AS cnt
    FROM events, (SELECT unnest([0, 1]) AS j)
    GROUP BY 1, 2
"""

#: SQ8 quantization twin of operators/similarity.py:quantize_embeddings —
#: identical expression order (float32 → float64 promotion is exact, the
#: rest is shared-order IEEE double math; floor(·+0.5) sidesteps the
#: engines' differing round-half tie rules), so codes hash bit-for-bit.
Q_EMBED_QUANTIZE = """
    WITH base AS (
        SELECT vec_id,
               embedding,
               CAST(list_min(embedding) AS DOUBLE) AS mn,
               CAST(list_max(embedding) AS DOUBLE) AS mx
        FROM embeddings
    ), coded AS (
        SELECT vec_id, embedding, mn, mx,
               list_transform(
                   embedding,
                   x -> CAST(CASE WHEN (mx - mn) > 0
                        THEN floor((CAST(x AS DOUBLE) - mn) / (mx - mn)
                                   * 255.0 + 0.5)
                        ELSE 0 END AS BIGINT)
               ) AS q
        FROM base
    )
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS n_dims,
           CAST(list_min(q) AS BIGINT) AS q_lo,
           CAST(list_max(q) AS BIGINT) AS q_hi,
           CAST(list_sum(q) AS BIGINT) AS q_sum,
           list_max(
               list_transform(
                   list_zip(embedding, q),
                   p -> abs(CAST(p[1] AS DOUBLE)
                            - (mn + CAST(p[2] AS DOUBLE) * (mx - mn)
                               / 255.0))
               )
           ) <= (mx - mn) / 510.0 * 1.000000001 + 1e-12 AS recon_ok
    FROM coded
"""

Q_SESSIONIZE = f"""
    WITH base AS (
        SELECT user_id, event_id,
               CAST({_FD_SEC} AS BIGINT) AS ts_s
        FROM events
    ), tagged AS (
        SELECT user_id, event_id, ts_s,
               CASE WHEN lag(ts_s) OVER w IS NULL
                      OR ts_s - lag(ts_s) OVER w > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ), sess AS (
        SELECT user_id, ts_s,
               CAST(sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts_s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_idx
        FROM tagged
    )
    SELECT user_id, session_idx,
           count(*) AS n_events,
           max(ts_s) - min(ts_s) AS duration_s
    FROM sess
    GROUP BY user_id, session_idx
"""

# TRY_CAST mirrors the engine's try_cast: a non-integer property value
# becomes NULL (absorbed by the null-skipping aggregates) instead of
# aborting the query.
#: DuckDB's json_extract_string ABORTS on malformed JSON ('' / '{' /
#: 'not json') — TRY_CAST can't save it because the extract itself
#: throws — while Spark's get_json_object returns NULL. json_valid()
#: gates the extract so both engines yield NULL for junk lines (found
#: by tools/fuzz_correctness.py; the driver fixture happens to be
#: all-valid JSON, crawl-scale props are not).
Q_JSON_EXTRACT = """
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(TRY_CAST(CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.k') END AS BIGINT))
                AS BIGINT) AS sum_k,
           min(TRY_CAST(CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.k') END AS BIGINT))
               AS min_k,
           max(TRY_CAST(CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.k') END AS BIGINT))
               AS max_k
    FROM events
    GROUP BY event_type
"""

# -- joins ------------------------------------------------------------------

Q_STAR_JOIN = """
    SELECT r_name, n_name,
           count(*) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
               AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r_name, n_name
"""

Q_ANTI_JOIN = f"""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_totalprice > {LARGE_ORDER_THRESHOLD})
    GROUP BY c_mktsegment
"""

# -- OLAP surface -----------------------------------------------------------

# Mirrors the engine's union+window as-of formulation (NOT DuckDB's native
# ASOF JOIN) so tie handling is defined identically on both sides.
# The payload rides inside a one-field STRUCT (non-NULL for every right
# row) so IGNORE NULLS skips only probe rows — a right row with a NULL
# payload value yields NULL, never a stale older payload. Same wrap as
# the engine (operators/asof.py).
Q_ASOF_JOIN = """
    WITH probes AS (
        SELECT user_id AS _k, epoch_us(ts) AS _ts, 1 AS _tag,
               CAST(NULL AS BIGINT) AS _tb,
               CAST(NULL AS STRUCT(v DOUBLE)) AS _pl,
               event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'error'
    ), pay AS (
        SELECT user_id, epoch_us(ts), 0, event_id, {'v': value},
               NULL, NULL, NULL
        FROM events WHERE event_type = 'purchase'
    ), u AS (
        SELECT * FROM probes UNION ALL SELECT * FROM pay
    ), carried AS (
        SELECT event_id, user_id, ts_us, _tag,
               (last_value(_pl IGNORE NULLS) OVER (
                   PARTITION BY _k ORDER BY _ts, _tag, _tb
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).v
                   AS last_purchase_value
        FROM u
    )
    SELECT event_id, user_id, ts_us, last_purchase_value
    FROM carried WHERE _tag = 1
"""

Q_ROLLUP = """
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS cnt,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
               AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""

Q_WINDOW_RANK = """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT)
                   AS rn
        FROM orders
    ) WHERE rn <= 3
"""

Q_PERCENTILE = """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.75) AS p75
    FROM orders
    GROUP BY o_orderpriority
"""

Q_SET_OPS = """
    SELECT o_orderstatus, count(*) AS cnt FROM (
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_orderpriority = '1-URGENT'
        UNION
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_totalprice > 350000
    )
    GROUP BY o_orderstatus
"""

# -- multimodal -------------------------------------------------------------

from financial_big_data_exp_4_spark.operators.multimodal import (  # noqa: E402
    FAKE_H_MOD,
    FAKE_H_MULT,
    FAKE_W_MOD,
)

Q_MULTIMODAL_META = f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % {FAKE_W_MOD} AS BIGINT)
               AS img_w,
           CAST((octet_length(encode(text)) * {FAKE_H_MULT}) % {FAKE_H_MOD}
                AS BIGINT) AS img_h,
           md5(text) AS digest
    FROM documents
"""

Q_MULTIMODAL_FRAMES = """
    WITH b AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(octet_length(encode(text)) % 4 + 1 AS BIGINT) AS nf,
               md5(text) AS digest
        FROM documents
    ), e AS (
        SELECT doc_id, n_bytes, nf, digest,
               unnest(range(0, nf)) AS frame_idx
        FROM b
    )
    SELECT doc_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * (n_bytes // nf) AS BIGINT) AS frame_off,
           digest || '-' || CAST(frame_idx AS VARCHAR) AS frame_hash
    FROM e
"""

EXTENSION_ORACLE_SQL: dict[str, str] = {
    "q_dedup_exact": Q_DEDUP_EXACT,
    "q_neardup_minhash": Q_NEARDUP_MINHASH,
    "q_dedup_simhash": Q_DEDUP_SIMHASH,
    "q_simhash_neardup": Q_SIMHASH_NEARDUP,
    "q_ngram_jaccard": Q_NGRAM_JACCARD,
    "q_embed_cosine_topk": Q_EMBED_COSINE_TOPK,
    "q_embed_ann_ivf": Q_EMBED_ANN_IVF,
    # learned-quantizer ANN: centroids are fit artifacts (float-reduction
    # order), so the declared output is per-probe structural/bounds
    # proofs; the oracle expects every proof TRUE — the q_approx_distinct
    # pattern. probe_id count matches the query's n_probes=5 default.
    # one all-TRUE proof row per probe that EXISTS in the data (and has a
    # direction): derived from the table, not range(5) — a fixture whose
    # vec_ids don't start at 0 (or whose probe rows are zero vectors)
    # changes the probe set, and the structural contract must follow it.
    # "has a direction" = some nonzero element, which equals the
    # engine's norm > 0 under the embedding contract (array<float>,
    # elements non-NULL and finite); a NULL/NaN element would break the
    # equivalence, and the engine side guards that by using norm > 0 for
    # BOTH its index and its has_k bound.
    # one all-TRUE row per INDEXABLE probe. Indexable = the engine
    # index's own predicate, norm > 0, where norm is a NULL-PROPAGATING
    # sequential fold of squares (a NULL element poisons the whole sum →
    # the vector is unindexable). DuckDB's list_sum SKIPS NULL elements
    # like SQL SUM — NOT equivalent — so the oracle folds with
    # list_reduce, whose a + NULL = NULL matches the engine's aggregate
    # lambda exactly; the empty-list case (engine: init 0.0 → norm 0 →
    # unindexable) is guarded explicitly because list_reduce errors on
    # empty input.
    "q_embed_ann_kmeans": """
        SELECT vec_id AS probe_id,
               TRUE AS has_k,
               TRUE AS ranks_contiguous,
               TRUE AS sims_bounded,
               TRUE AS best_le_exact
        FROM embeddings
        WHERE vec_id < 5
          AND CASE WHEN len(embedding) = 0 THEN FALSE
              ELSE list_reduce(
                  list_transform(embedding,
                                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                  (a, v) -> a + v) > 0 END
    """,
    "q_embed_neardup": Q_EMBED_NEARDUP,
    "q_token_count": Q_TOKEN_COUNT,
    "q_text_quality": Q_TEXT_QUALITY,
    "q_lang_id": Q_LANG_ID,
    "q_doc_fingerprint": Q_DOC_FINGERPRINT,
    "q_tumbling_window": Q_TUMBLING_WINDOW,
    "q_hopping_window": Q_HOPPING_WINDOW,
    "q_embed_quantize": Q_EMBED_QUANTIZE,
    "q_sessionize": Q_SESSIONIZE,
    "q_json_extract": Q_JSON_EXTRACT,
    "q_star_join": Q_STAR_JOIN,
    "q_anti_join": Q_ANTI_JOIN,
    "q_multimodal_meta": Q_MULTIMODAL_META,
    "q_multimodal_frames": Q_MULTIMODAL_FRAMES,
    # streaming ≡ batch: the bounded availableNow drain must reproduce the
    # batch tumbling aggregate exactly, so the batch oracle applies.
    "q_stream_tumbling": Q_TUMBLING_WINDOW,
    "q_asof_join": Q_ASOF_JOIN,
    "q_rollup": Q_ROLLUP,
    "q_window_rank": Q_WINDOW_RANK,
    "q_percentile": Q_PERCENTILE,
    "q_set_ops": Q_SET_OPS,
    "q_distinct_agg": f"""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(DISTINCT {_FD_DAY}) AS n_days
        FROM events
        GROUP BY event_type
    """,
    "q_cube": """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS cnt,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
                   AS revenue
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    "q_pivot": """
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_o,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_p
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    # session_window gap semantics: an event exactly `gap` after the
    # previous one still MERGES (verified empirically at sf0.1 — Spark
    # treats "within the gap duration" inclusively), so NEW session iff
    # ts - last > gap, the same convention as the batch sessionizer.
    "q_stream_sessions": f"""
        WITH base AS (
            SELECT user_id, event_id,
                   CAST({_FD_SEC} AS BIGINT) AS ts_s
            FROM events
        ), tagged AS (
            SELECT user_id, event_id, ts_s,
                   CASE WHEN lag(ts_s) OVER w IS NULL
                          OR ts_s - lag(ts_s) OVER w > 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
        ), sess AS (
            -- the running sum MUST order by the same total key as the
            -- lag window: same-second ties are routine after the
            -- whole-second truncation, and an ordering on ts_s alone
            -- would make session assignment depend on sort stability
            SELECT user_id, ts_s,
                   CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts_s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_idx
            FROM tagged
        )
        SELECT user_id,
               min(ts_s) AS session_start_s,
               count(*) AS n_events
        FROM sess
        GROUP BY user_id, session_idx
    """,
    "q_range_join": f"""
        SELECT e.user_id, e.event_id AS err_id, p.event_id AS purch_id,
               p.value
        FROM events e JOIN events p ON e.user_id = p.user_id
        WHERE e.event_type = 'error' AND p.event_type = 'purchase'
          AND epoch_us(e.ts) >= epoch_us(p.ts)
          AND epoch_us(e.ts) < epoch_us(p.ts) + {US_PER_HOUR}
    """,
    # keep-latest is uniquely defined by the (ts, event_id) total order,
    # so the window formulation here must equal the engine's aggregate
    # argmax exactly.
    "q_dedup_latest": """
        SELECT user_id, ts_us, event_id FROM (
            SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "q_hash_sample": f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE {det_hash_mod_sql("o_orderkey", 100)} < 10
    """,
    "q_text_normalize": """
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                    '[\\t\\r\\n]+', ' ', 'g'), ' {2,}', ' ', 'g'))
                   AS norm_text,
               trim(regexp_replace(regexp_replace(lower(text),
                    '[\\t\\r\\n]+', ' ', 'g'), ' {2,}', ' ', 'g')) <> text
                   AS changed
        FROM documents
    """,
    # GROUPING() bit order (leftmost arg = MSB) matches Spark's
    # grouping_id() over the same column list.
    "q_grouping_sets": """
        SELECT o_orderpriority, o_orderstatus,
               CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT)
                   AS gid,
               count(*) AS cnt,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
                   AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
    "q_quality_filter": f"""
        WITH f AS (
            SELECT doc_id,
                   -- NULL text -> empty token list (engine in lockstep):
                   -- keep must be a real boolean for every row
                   COALESCE({TOKENIZE}, []) AS toks,
                   CAST(len(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                        AS BIGINT) AS tok_chars,
                   CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))
                        AS BIGINT) AS n_sym
            FROM documents
        ), g AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_words,
                   tok_chars, n_sym,
                   list_has_any(toks, {_sql_list(QUALITY_STOPWORDS)})
                       AS has_stopword
            FROM f
        ), h AS (
            SELECT doc_id, n_words,
                   CASE WHEN n_words > 0
                        THEN CAST(tok_chars AS DOUBLE)
                             / CAST(n_words AS DOUBLE)
                        ELSE 0.0 END AS mean_word_len,
                   CASE WHEN n_words > 0
                        THEN CAST(n_sym AS DOUBLE) / CAST(n_words AS DOUBLE)
                        ELSE 0.0 END AS symbol_word_ratio,
                   has_stopword
            FROM g
        )
        SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
               has_stopword,
               (n_words >= {QF_MIN_WORDS} AND n_words <= {QF_MAX_WORDS}
                AND mean_word_len >= {QF_MIN_MEAN_LEN}
                AND mean_word_len <= {QF_MAX_MEAN_LEN}
                AND symbol_word_ratio <= {QF_MAX_SYMBOL_RATIO}
                AND has_stopword) AS keep
        FROM h
    """,
    "q_repetition": f"""
        WITH toks AS (
            SELECT doc_id, {TOKENIZE} AS t FROM documents
        ), words AS (
            SELECT doc_id,
                   CAST(len(t) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(t)) AS BIGINT) AS nd
            FROM toks
        ), bg AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(t) - 1),
                          bi -> t[bi] || ' ' || t[bi + 1])) AS bigram
            FROM toks WHERE len(t) >= 2
        ), bgc AS (
            SELECT doc_id, bigram, count(*) AS cnt
            FROM bg GROUP BY doc_id, bigram
        ), bgr AS (
            SELECT doc_id, bigram, cnt,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY cnt DESC, bigram) AS rn,
                   sum(cnt) OVER (PARTITION BY doc_id) AS total
            FROM bgc
        )
        SELECT w.doc_id, w.n_tokens,
               CASE WHEN w.n_tokens > 0
                    THEN CAST(w.n_tokens - w.nd AS DOUBLE)
                         / CAST(w.n_tokens AS DOUBLE)
                    ELSE 0.0 END AS dup_word_frac,
               coalesce(b.bigram, '') AS top_bigram,
               CAST(coalesce(b.cnt, 0) AS BIGINT) AS top_bigram_n,
               coalesce(CAST(b.cnt AS DOUBLE) / CAST(b.total AS DOUBLE),
                        0.0) AS top_bigram_frac
        FROM words w
        LEFT JOIN (SELECT * FROM bgr WHERE rn = 1) b USING (doc_id)
    """,
    # linear idf (tf * N / df): ln() is deliberately absent — IEEE
    # +-*/ are exactly rounded (bit-identical across engines),
    # transcendentals are not. Same expression order as the Spark side.
    "q_tfidf": f"""
        WITH tok AS (
            SELECT doc_id, unnest({TOKENIZE}) AS term FROM documents
        ), stats AS (
            SELECT term,
                   CAST(count(*) AS BIGINT) AS tf,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM tok GROUP BY term
        ), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
        SELECT term, tf, df,
               CAST(tf AS DOUBLE) * CAST(n_docs AS DOUBLE)
                   / CAST(df AS DOUBLE) AS tfidf
        FROM stats, n
        ORDER BY tfidf DESC, term
        LIMIT {TFIDF_TOP_K}
    """,
    "q_seq_pack": f"""
        WITH d AS (
            SELECT doc_id,
                   doc_id // {PACK_CHUNK} AS chunk,
                   CAST(len(regexp_extract_all(lower(text),
                        '{BPE_TOKEN_RE}')) AS BIGINT) AS n_tok
            FROM documents
        ), c AS (
            SELECT chunk, n_tok,
                   sum(n_tok) OVER (PARTITION BY chunk ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM d
        )
        SELECT chunk,
               -- cum is a windowed sum -> HUGEINT in DuckDB; cast the
               -- derived bin back to BIGINT for a stable output type
               CAST((greatest(cum, 1) - 1) // {PACK_BUDGET} AS BIGINT)
                   AS bin,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM c
        GROUP BY chunk, bin
    """,
    "q_stratified_sample": f"""
        SELECT event_id, event_type, user_id
        FROM events
        WHERE {det_hash_mod_sql("event_id", 1000)}
              < CASE event_type {_rate_cases()} ELSE 0 END
    """,
    "q_inverted_index": f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_distinct({TOKENIZE})) AS term
            FROM documents
        ), r AS (
            SELECT term, doc_id,
                   row_number() OVER (PARTITION BY term ORDER BY doc_id)
                       AS rn,
                   count(*) OVER (PARTITION BY term) AS df
            FROM tok
        )
        SELECT term,
               CAST(max(df) AS BIGINT) AS n_docs,
               array_to_string(
                   list_transform(list_sort(list(doc_id)),
                                  pv -> CAST(pv AS VARCHAR)), ',')
                   AS postings
        FROM r WHERE rn <= {INDEX_MAX_POSTINGS}
        GROUP BY term
    """,
    # clustering oracle: transitive closure (recursive CTE) over the SAME
    # generated candidate-pair SQL the q_neardup_minhash oracle uses, then
    # min reachable id per node — the closed-form mirror of the iterative
    # min-label propagation on the Spark side.
    # SemDeDup oracle: the same recursive-CTE transitive closure as
    # q_dedup_clusters, over the embedding near-dup pair SQL instead of
    # the minhash one; representative = component minimum.
    "q_semantic_dedup": f"""
        WITH RECURSIVE cand AS MATERIALIZED ({Q_EMBED_NEARDUP}),
        e AS MATERIALIZED (
            SELECT vec_a AS u, vec_b AS v FROM cand
            UNION
            SELECT vec_b AS u, vec_a AS v FROM cand
        ),
        tc AS (
            SELECT u, v FROM e
            UNION
            SELECT tc.u, e.v FROM tc JOIN e ON tc.v = e.u
        )
        SELECT u AS vec_id, least(u, min(v)) AS group_id,
               u = least(u, min(v)) AS is_representative
        FROM tc GROUP BY u
    """,
    "q_dedup_clusters": f"""
        WITH RECURSIVE cand AS MATERIALIZED ({Q_NEARDUP_MINHASH}),
        e AS MATERIALIZED (
            SELECT doc_a AS u, doc_b AS v FROM cand
            UNION
            SELECT doc_b AS u, doc_a AS v FROM cand
        ),
        tc AS (
            SELECT u, v FROM e
            UNION
            SELECT tc.u, e.v FROM tc JOIN e ON tc.v = e.u
        )
        SELECT u AS doc_id, least(u, min(v)) AS cluster_id
        FROM tc GROUP BY u
    """,
    # the pandas grouped-map's median is quantile_cont(0.5) exactly
    # (interpolated middle = one IEEE-exact average), so the Arrow
    # boundary sits under the hash. Aggregate+join form here mirrors the
    # per-group computation without window syntax differences.
    # IS NOT DISTINCT FROM, not USING: Spark's groupBy treats a NULL key
    # as a real group (the engine's applyInPandas centers it like any
    # other), so the median join must be NULL-safe or every NULL-key row
    # silently falls out of the oracle (found by tools/fuzz_correctness.py)
    "q_group_center": """
        WITH m AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, e.value,
               e.value - m.med AS centered_value
        FROM events e
        JOIN m ON e.event_type IS NOT DISTINCT FROM m.event_type
        WHERE e.value IS NOT NULL
    """,
    # the Spark side emits (exact, sketch-within-±5%); the oracle asserts
    # the flag is TRUE on every row — the sketch's accuracy is the check.
    "q_approx_distinct": """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
               TRUE AS within_5pct
        FROM events
        GROUP BY event_type
    """,
    # salting must be output-invariant: the oracle is the UNSALTED agg.
    "q_skew_agg": """
        SELECT event_type, count(*) AS cnt
        FROM events
        GROUP BY event_type
    """,
    "q_sql_surface": """
        SELECT c_mktsegment, count(*) AS cnt
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY cnt DESC, c_mktsegment
    """,
    # ntile bucket boundaries are defined identically (first n_rows%k
    # buckets get the extra row) given the same total order.
    "q_ntile": """
        SELECT o_orderkey, o_orderpriority,
               CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice, o_orderkey) AS BIGINT)
                   AS quartile
        FROM orders
    """,
    # streaming dedup ≡ batch DISTINCT: the bounded availableNow drain of
    # dropDuplicates must emit exactly the distinct key set.
    "q_stream_dedup": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    "q_semi_join": f"""
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_totalprice > {LARGE_ORDER_THRESHOLD}
        )
    """,
    # frame sums route through DECIMAL(18,6) on both sides: windowed
    # double sums are engine-specific in association order (sliding
    # optimizers subtract-and-add; segment trees regroup) — decimal
    # addition is associative, so the moving stats hash identically.
    "q_moving_avg": """
        WITH b AS (
            SELECT event_id, user_id,
                   epoch_us(ts) AS ts_us,
                   CAST(value AS DECIMAL(18,6)) AS v
            FROM events
        )
        SELECT event_id, user_id, ts_us,
               CAST(CAST(sum(v) OVER w AS VARCHAR) AS DOUBLE) AS mov_sum,
               CAST(CAST(sum(v) OVER w AS VARCHAR) AS DOUBLE)
                   / CAST(count(v) OVER w AS DOUBLE) AS mov_avg
        FROM b
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    # Bloom prefilter: the oracle REPLAYS the identical bit construction
    # (same md5 double-hash positions h1 + i*h2 mod m, same 63-bit words
    # — 63, never 64: DuckDB raises on BIGINT 1<<63 where Spark wraps),
    # so bloom_hit is hash-compared bit-for-bit; no_false_negative is
    # the Bloom contract as a row-wise proof. m derives from the corpus
    # count via the same GREATEST(1, ceil)*63 closed form
    # (operators/dedup.py:bloom_words_size).
    "q_bloom_prefilter": """
        WITH base AS (
            SELECT doc_id, md5(text) AS h FROM documents
        ),
        corpus AS (
            SELECT h FROM base WHERE doc_id % 37 <> 0 AND h IS NOT NULL
        ),
        params AS (
            SELECT GREATEST(1, (COUNT(*) * 10 + 62) // 63) * 63 AS m
            FROM corpus
        ),
        cpos AS (
            SELECT (CAST('0x' || substr(c.h, 1, 13) AS BIGINT)
                    + i.i * CAST('0x' || substr(c.h, 14, 13) AS BIGINT))
                   % p.m AS pos
            FROM corpus c
            CROSS JOIN params p
            CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) i
        ),
        words AS (
            SELECT pos // 63 AS word_idx,
                   bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT))
                       AS word
            FROM cpos GROUP BY 1
        ),
        batch AS (
            SELECT doc_id, h FROM base WHERE doc_id % 37 = 0
        ),
        bpos AS (
            SELECT b.doc_id,
                   (CAST('0x' || substr(b.h, 1, 13) AS BIGINT)
                    + i.i * CAST('0x' || substr(b.h, 14, 13) AS BIGINT))
                   % p.m AS pos
            FROM batch b
            CROSS JOIN params p
            CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) i
        ),
        flags AS (
            SELECT bp.doc_id,
                   bool_and(COALESCE(
                       (w.word & (CAST(1 AS BIGINT)
                                  << CAST(bp.pos % 63 AS INT)))
                       = (CAST(1 AS BIGINT)
                          << CAST(bp.pos % 63 AS INT)),
                       FALSE)) AS bloom_hit
            FROM bpos bp
            LEFT JOIN words w ON w.word_idx = bp.pos // 63
            GROUP BY bp.doc_id
        ),
        exact AS (
            SELECT b.doc_id,
                   COALESCE(b.h IN (SELECT h FROM corpus), FALSE)
                       AS exact_hit
            FROM batch b
        )
        SELECT f.doc_id, f.bloom_hit, e.exact_hit,
               (f.bloom_hit OR NOT e.exact_hit) AS no_false_negative
        FROM flags f JOIN exact e ON f.doc_id = e.doc_id
    """,
    "q_dedup_apply": """
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d
        JOIN (
            SELECT md5(text) AS dg, min(doc_id) AS keep_id
            FROM documents GROUP BY md5(text)
        ) k ON md5(d.text) = k.dg AND d.doc_id = k.keep_id
    """,
    # phone count runs on the EMAIL-REDACTED text (sequential-replacement
    # audit semantics — engine in lockstep): a phone-shaped substring
    # inside an email never becomes a [PHONE] token.
    "q_pii_scrub": f"""
        WITH e AS (
            SELECT doc_id, text,
                   regexp_replace(text, '{PII_EMAIL}', '[EMAIL]', 'g')
                       AS after_email
            FROM documents
        )
        SELECT doc_id,
               regexp_replace(after_email,
                   '{PII_PHONE}', '[PHONE]', 'g') AS clean_text,
               CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(after_email, '{PII_PHONE}'))
                    AS BIGINT) AS n_phones
        FROM e
    """,
    # sketch-accuracy proof row (same pattern as q_approx_distinct): the
    # oracle pins the exact median and expects the tolerance flag TRUE.
    # the engine asserts the GK sketch's RANK accuracy (its actual
    # guarantee); the oracle expects the proof TRUE for every group
    "q_approx_percentile": """
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.5) AS p50_exact,
               TRUE AS sketch_rank_ok
        FROM orders
        GROUP BY o_orderpriority
    """,
    # all money math inside DECIMAL (order-independent sums; identical
    # widening as Spark: (12,2)*(4,2)*(4,2) -> scale 6), averages derived
    # from the decimal sums with one double division each.
    "q_shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-15'
          AND l_shipdate > TIMESTAMP '1998-06-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    # ns→µs reader truncation cannot move an event across a whole-second
    # hour boundary; grid generated from the aggregate, not a rescan
    "q_gap_fill": f"""
        WITH counts AS (
            SELECT event_type,
                   {_FD_HOUR} AS hour_bucket,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        ), spans AS (
            SELECT event_type, min(hour_bucket) AS lo, max(hour_bucket) AS hi
            FROM counts GROUP BY 1
        ), grid AS (
            SELECT event_type, unnest(range(lo, hi + 1)) AS hour_bucket
            FROM spans
        )
        SELECT g.event_type,
               CAST(g.hour_bucket * 3600 AS BIGINT) AS hour_start_s,
               CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events
        FROM grid g LEFT JOIN counts c USING (event_type, hour_bucket)
    """,
    "q_running_total": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS VARCHAR) AS DOUBLE) AS cum_spend
        FROM orders
    """,
    "q_correlation": """
        WITH d AS (
            SELECT l_returnflag,
                   CAST(l_quantity AS DECIMAL(12,2)) AS xd,
                   CAST(l_extendedprice AS DECIMAL(12,2)) AS yd
            FROM lineitem
        ), m AS (
            SELECT l_returnflag,
                   CAST(count(*) AS DOUBLE) AS n,
                   CAST(CAST(sum(xd) AS VARCHAR) AS DOUBLE) AS sx,
                   CAST(CAST(sum(yd) AS VARCHAR) AS DOUBLE) AS sy,
                   CAST(CAST(sum(xd * yd) AS VARCHAR) AS DOUBLE) AS sxy,
                   CAST(CAST(sum(xd * xd) AS VARCHAR) AS DOUBLE) AS sxx,
                   CAST(CAST(sum(yd * yd) AS VARCHAR) AS DOUBLE) AS syy,
                   count(*) AS n_rows
            FROM d GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               (n * sxy - sx * sy)
                   / (sqrt(greatest(n * sxx - sx * sx, 0.0))
                      * sqrt(greatest(n * syy - sy * sy, 0.0)))
                   AS corr_qty_price,
               n_rows
        FROM m
    """,
    # salting is output-invariant: the oracle is the plain join+aggregate
    "q_skew_join": """
        SELECT p_brand,
               count(*) AS n_items,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
                   AS sum_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "q_lineitem_pricing": """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
                   AS sum_qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
                   AS sum_base_price,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(1.0 - l_discount AS DECIMAL(4,2))
                        * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS sum_charge,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_price,
               CAST(CAST(sum(CAST(l_discount AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_disc,
               count(*) AS cnt
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag, l_linestatus
    """,
}

# Composed post-hoc so the yield oracle reuses the quality-filter SQL
# verbatim — the two can never drift.
EXTENSION_ORACLE_SQL["q_curation_yield"] = f"""
    WITH qf AS ({EXTENSION_ORACLE_SQL["q_quality_filter"]})
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN qf.keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_keep,
           CAST(CAST(sum(CASE WHEN qf.keep THEN 1 ELSE 0 END) AS VARCHAR) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS yield_rate
    FROM documents d JOIN qf USING (doc_id)
    GROUP BY d.source
"""

# streaming ≡ batch: the bounded stream-stream join drain must reproduce
# the batch bucketed range join exactly, so its oracle applies verbatim.
EXTENSION_ORACLE_SQL["q_stream_range_join"] = EXTENSION_ORACLE_SQL[
    "q_range_join"
]

# LSH recall → exact-precision verify: candidates from the generated
# minhash SQL, exact bigram Jaccard computed only on those pairs.
from financial_big_data_exp_4_spark.operators.dedup import (  # noqa: E402
    NEARDUP_VERIFY_THRESHOLD,
)

# Same candidate front end, capped character edit distance as the verify
# metric (integer → hash-exact on any engine). The cap
# (operators.dedup.EDIT_DISTANCE_CAP) is part of the declared semantics:
# it lets the engine use Spark's early-exit levenshtein(l, r, threshold)
# form — O(len × cap) per pair instead of O(len²).
EXTENSION_ORACLE_SQL["q_neardup_edit"] = f"""
    WITH cand AS ({Q_NEARDUP_MINHASH})
    SELECT c.doc_a, c.doc_b,
           CAST(CASE
                WHEN da.text = db.text THEN 0
                WHEN abs(length(da.text) - length(db.text))
                     > {EDIT_DISTANCE_CAP} THEN {EDIT_DISTANCE_CAP}
                ELSE least(levenshtein(da.text, db.text),
                           {EDIT_DISTANCE_CAP})
                END AS BIGINT) AS edit_dist
    FROM cand c
    JOIN documents da ON c.doc_a = da.doc_id
    JOIN documents db ON c.doc_b = db.doc_id
"""

EXTENSION_ORACLE_SQL["q_neardup_verified"] = f"""
    WITH cand AS ({Q_NEARDUP_MINHASH}),
    g AS (
        SELECT doc_id AS doc, {_GRAMS} AS grams
        FROM (SELECT doc_id, {TOKENIZE} AS toks FROM documents)
    ),
    j AS (
        SELECT c.doc_a, c.doc_b,
               CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0
                    THEN CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                         / CAST(len(list_distinct(list_concat(a.grams,
                                b.grams))) AS DOUBLE)
                    ELSE 0.0 END AS jaccard
        FROM cand c
        JOIN g a ON c.doc_a = a.doc
        JOIN g b ON c.doc_b = b.doc
    )
    SELECT doc_a, doc_b, jaccard FROM j
    WHERE jaccard >= {NEARDUP_VERIFY_THRESHOLD}
"""

# -- round-3 additions: MERGE apply, SCD2, winsorize, chunking, BM25, ----
# -- hyperplane LSH ------------------------------------------------------

#: The CDC change set is derived (keys mod 97) so the oracle rebuilds it
#: verbatim; the MERGE itself is LEFT JOIN + NOT IN + UNION ALL.
EXTENSION_ORACLE_SQL["q_merge_upsert"] = """
    WITH upd AS (
        SELECT o_orderkey AS k, o_totalprice + 1000.0 AS new_price,
               o_orderstatus AS new_status
        FROM orders WHERE o_orderkey % 97 = 1
    ), del AS (
        SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 97 = 2
    )
    SELECT b.o_orderkey,
           CASE WHEN u.k IS NOT NULL THEN u.new_price
                ELSE b.o_totalprice END AS o_totalprice,
           CASE WHEN u.k IS NOT NULL THEN u.new_status
                ELSE b.o_orderstatus END AS o_orderstatus
    FROM orders b
    LEFT JOIN upd u ON b.o_orderkey = u.k
    WHERE b.o_orderkey NOT IN (SELECT k FROM del)
    UNION ALL
    SELECT -o_orderkey AS o_orderkey, o_totalprice,
           'N' AS o_orderstatus
    FROM orders WHERE o_orderkey % 97 = 3
"""

EXTENSION_ORACLE_SQL["q_scd2"] = f"""
    WITH e AS (
        SELECT user_id, event_id,
               CAST({_FD_SEC} AS BIGINT) AS ts_s,
               event_type
        FROM events
    ), flagged AS (
        SELECT user_id, event_id, ts_s, event_type,
               CASE WHEN row_number() OVER w = 1
                      OR lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ), versioned AS (
        SELECT user_id, ts_s, event_type,
               CAST(sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts_s, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        FROM flagged
    ), intervals AS (
        SELECT user_id, version,
               min(event_type) AS event_type,
               min(ts_s) AS valid_from_s,
               count(*) AS n_events
        FROM versioned GROUP BY user_id, version
    )
    SELECT user_id, version, event_type, valid_from_s,
           lead(valid_from_s) OVER (
               PARTITION BY user_id ORDER BY version) AS valid_to_s,
           n_events
    FROM intervals
"""

#: quantile_cont == Spark's exact interpolated percentile; the clip is
#: least/greatest (comparisons only) on both sides.
EXTENSION_ORACLE_SQL["q_winsorize"] = """
    WITH b AS (
        SELECT o_orderpriority AS g,
               quantile_cont(o_totalprice, 0.05) AS lo,
               quantile_cont(o_totalprice, 0.95) AS hi
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
           b.lo AS lo_bound, b.hi AS hi_bound,
           least(greatest(o.o_totalprice, b.lo), b.hi)
               AS o_totalprice_clipped,
           (o.o_totalprice < b.lo OR o.o_totalprice > b.hi)
               AS was_clipped
    FROM orders o JOIN b ON o.o_orderpriority = b.g
"""

_CHUNK_STEP = CHUNK_WIDTH - CHUNK_OVERLAP
EXTENSION_ORACLE_SQL["q_doc_chunks"] = f"""
    WITH s AS (
        SELECT doc_id, text,
               unnest(generate_series(
                   1, greatest(length(text) - {CHUNK_OVERLAP}, 1),
                   {_CHUNK_STEP})) AS start
        FROM documents
    )
    SELECT doc_id,
           CAST((start - 1) // {_CHUNK_STEP} AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS start,
           CAST(length(substr(text, CAST(start AS INTEGER),
                              {CHUNK_WIDTH})) AS BIGINT) AS chunk_len,
           md5(substr(text, CAST(start AS INTEGER), {CHUNK_WIDTH}))
               AS chunk_md5
    FROM s
"""

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
#: Expression association mirrors the Spark side exactly:
#: idf = (N − df + 0.5)/(df + 0.5); denominator (tf + k1·(1−b + b·dl/avgdl)).
EXTENSION_ORACLE_SQL["q_bm25"] = f"""
    WITH base AS (
        SELECT doc_id, {TOKENIZE} AS toks FROM documents
    ), corpus AS (
        SELECT count(*) AS n_docs, sum(len(toks)) AS sum_dl FROM base
    ), hits AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
               unnest(toks) AS term
        FROM base
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
        FROM hits WHERE term IN ({_BM25_TERMS_SQL})
        GROUP BY doc_id, term
    ), dfp AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), scored AS (
        SELECT t.term, t.doc_id, CAST(t.tf AS BIGINT) AS tf, t.dl,
               ((CAST(c.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                / (CAST(d.df AS DOUBLE) + 0.5))
               * ((CAST(t.tf AS DOUBLE) * {BM25_K1 + 1.0!r})
                  / (CAST(t.tf AS DOUBLE)
                     + {BM25_K1!r} * ({1.0 - BM25_B!r}
                        + {BM25_B!r} * CAST(t.dl AS DOUBLE)
                          / (CAST(c.sum_dl AS DOUBLE)
                             / CAST(c.n_docs AS DOUBLE)))))
               AS bm25
        FROM tf t JOIN dfp d USING (term) CROSS JOIN corpus c
    ), ranked AS (
        SELECT term, doc_id, tf, dl, bm25,
               CAST(row_number() OVER (
                   PARTITION BY term
                   ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank
        FROM scored
    )
    SELECT term, doc_id, tf, dl, bm25, rank
    FROM ranked WHERE rank <= {BM25_TOP_K}
"""

#: Bigram-LM scoring twin of operators/corpus.py:lm_bigram_scores —
#: same tokenizer, bigrams enumerated per 1-based index (tk[i], tk[i+1]),
#: prob = one IEEE division of bigints, per-doc mean through a
#: DECIMAL(18,12) sum (associative). Probabilities, not ln(): libm ulp
#: differences would break the hash.
EXTENSION_ORACLE_SQL["q_lm_bigram"] = f"""
    WITH toks AS (
        SELECT doc_id, {TOKENIZE} AS tk FROM documents
    ), bg AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        FROM toks, UNNEST(range(1, len(tk))) AS u(i)
    ), c2 AS (
        SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY w1, w2
    ), c1 AS (
        SELECT w1, count(*) AS n1 FROM bg GROUP BY w1
    ), scored AS (
        SELECT bg.doc_id, CAST(n2 AS DOUBLE) / n1 AS p
        FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CAST(p AS DECIMAL(18,12))) AS DOUBLE) / count(*)
               AS lm_prob
    FROM scored
    GROUP BY doc_id
"""

#: Inner fold has no DuckDB initial value — its x1 + x2 + … equals
#: Spark's (0.0 + x1) + x2 + … bit-for-bit. Weights are derived
#: integers, exact in double; the > 0.0 sign test is therefore portable.
EXTENSION_ORACLE_SQL["q_embed_lsh"] = f"""
    SELECT vec_id,
           list_reduce(
             list_transform(generate_series(0, {LSH_PLANES - 1}), p ->
               CASE WHEN list_reduce(
                 list_transform(generate_series(1, len(embedding)), di ->
                   CAST(embedding[di] AS DOUBLE)
                   * CAST({_lsh_weight_sql("p * len(embedding) + di - 1")}
                          AS DOUBLE)),
                 (a, v) -> a + v) > 0.0
               THEN (CAST(1 AS BIGINT) << p)
               ELSE CAST(0 AS BIGINT) END),
             (acc, v) -> acc + v) AS sig
    FROM embeddings
"""

EXTENSION_ORACLE_SQL["q_funnel"] = """
    WITH pu AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view'
                        THEN epoch_us(ts) END) AS t0,
               min(CASE WHEN event_type = 'click'
                        THEN epoch_us(ts) END) AS t1,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS t2
        FROM events GROUP BY user_id
    ), tot AS (
        SELECT
            CAST(coalesce(sum(CASE WHEN t0 IS NOT NULL
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n0,
            CAST(coalesce(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL
                           AND t0 < t1
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n1,
            CAST(coalesce(sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL
                           AND t0 < t1 AND t2 IS NOT NULL AND t1 < t2
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n2
        FROM pu
    )
    SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
           n0 AS n_users FROM tot
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'click', n1 FROM tot
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase', n2 FROM tot
"""

EXTENSION_ORACLE_SQL["q_cohort_retention"] = f"""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST({_FD_DAY} AS BIGINT) AS day
        FROM events
    ), fd AS (
        SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id
    )
    SELECT f.cohort_day, u.day - f.cohort_day AS day_offset,
           count(*) AS n_users
    FROM ud u JOIN fd f USING (user_id)
    GROUP BY f.cohort_day, u.day - f.cohort_day
"""

_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
EXTENSION_ORACLE_SQL["q_profile"] = "\n    UNION ALL\n".join(
    f"""
    SELECT '{c}' AS "column", count(*) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           count(DISTINCT {c}) AS n_distinct
    FROM orders"""
    for c in _PROFILE_COLS
)

#: The diff target is the MERGE output — its oracle SQL is reused
#: verbatim as a CTE, so the two queries cannot drift.
EXTENSION_ORACLE_SQL["q_table_diff"] = f"""
    WITH merged AS ({EXTENSION_ORACLE_SQL["q_merge_upsert"]})
    SELECT diff_class, count(*) AS n_keys FROM (
        SELECT CASE
            WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN m.o_orderkey IS NULL THEN 'removed'
            WHEN o.o_totalprice IS NOT DISTINCT FROM m.o_totalprice
             AND o.o_orderstatus IS NOT DISTINCT FROM m.o_orderstatus
                THEN 'unchanged'
            ELSE 'changed' END AS diff_class
        FROM orders o
        FULL OUTER JOIN merged m ON o.o_orderkey = m.o_orderkey
    )
    GROUP BY diff_class
"""

_LSH_BAND_W = LSH_PLANES // 2
_LSH_BANDS_SQL = "\n        UNION ALL ".join(
    f"SELECT vec_id, sig, {b} AS band_id, "
    f"(sig >> {b * _LSH_BAND_W}) & {(1 << _LSH_BAND_W) - 1} AS band_key "
    "FROM sigs"
    for b in range(2)
)
#: Banded hyperplane-LSH pairing over the generated signature SQL; exact
#: cosine via the same sequential fold as the other similarity oracles.
EXTENSION_ORACLE_SQL["q_embed_lsh_pairs"] = f"""
    WITH sigs AS ({EXTENSION_ORACLE_SQL["q_embed_lsh"]}
    ), bands AS (
        {_LSH_BANDS_SQL}
    )
    SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b,
           CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming,
           {_cos('ea.embedding', 'eb.embedding')} AS cos_sim
    FROM bands x
    JOIN bands y
      ON x.band_id = y.band_id AND x.band_key = y.band_key
     AND x.vec_id < y.vec_id
    JOIN embeddings ea ON x.vec_id = ea.vec_id
    JOIN embeddings eb ON y.vec_id = eb.vec_id
"""

EXTENSION_ORACLE_SQL["q_window_stats"] = """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
"""

EXTENSION_ORACLE_SQL["q_transitions"] = """
    WITH tagged AS (
        SELECT event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type, count(*) AS n_transitions
    FROM tagged WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
"""

#: Moments mirror standard_scale's association exactly:
#: mean = Σx/n, std = sqrt((n·Σx² − Σx·Σx)/(n·n)), all factors DOUBLE
#: from DECIMAL(12,2) sums.
# DECIMAL(18,2) matches the engine's widened exact cast (a (12,2)
# aborts both engines on ±1e12-class balances); count(c_acctbal), not
# count(*), matches the engine's NULL-skipping moments (sum() skips
# NULLs, so dividing by count(*) biases mean and std on NULL-bearing
# input — the engine has divided by the non-NULL count since the
# round-5 totality fix, and the oracle must too). The square widens ONE
# operand to (19,2): DuckDB multiplies (18)x(18) in int64 (overflows on
# 1e14-scale internal ints) but promotes to int128 once an operand
# exceeds 18 digits, yielding the exact DECIMAL(37,4) Spark produces.
EXTENSION_ORACLE_SQL["q_standard_scale"] = """
    WITH m AS (
        SELECT c_nationkey AS g,
               CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                   / CAST(count(c_acctbal) AS DOUBLE) AS mean,
               sqrt(greatest((CAST(count(c_acctbal) AS DOUBLE)
                     * CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(19,2))
                                * CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                     - CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                       * CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE))
                    / (CAST(count(c_acctbal) AS DOUBLE)
                       * CAST(count(c_acctbal) AS DOUBLE)), 0.0)) AS std
        FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
           m.mean AS group_mean, m.std AS group_std,
           CASE WHEN m.std > 0.0
                THEN (c.c_acctbal - m.mean) / m.std END AS c_acctbal_scaled
    FROM customer c JOIN m ON c.c_nationkey = m.g
"""

EXTENSION_ORACLE_SQL["q_local_supplier_volume"] = """
    SELECT n_name,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
"""

EXTENSION_ORACLE_SQL["q_large_orders"] = """
    WITH big AS (
        SELECT l_orderkey,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
                   AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE)
               > 300.0
    )
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 100
"""

#: Triangle counting over the MinHash document near-dup candidate graph;
#: the pairs CTE is the q_neardup_minhash SQL verbatim, so edge sets
#: cannot drift (round 7: moved off the hyperplane graph — with honest
#: decorrelated planes a random embedding corpus has ~no Hamming≤2 pairs,
#: while the document corpus has real near-dup clusters at every scale).
EXTENSION_ORACLE_SQL["q_triangle_count"] = f"""
    WITH pairs AS MATERIALIZED ({Q_NEARDUP_MINHASH}
    ), e AS MATERIALIZED (
        SELECT DISTINCT least(doc_a, doc_b) AS lo,
               greatest(doc_a, doc_b) AS hi
        FROM pairs
    ), tri AS (
        SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
        FROM e ab
        JOIN e bc ON ab.hi = bc.lo
        JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi
    )
    SELECT node, count(*) AS n_triangles
    FROM (SELECT unnest([a, b, c]) AS node FROM tri)
    GROUP BY node
"""

#: Custom-stateful streaming ≡ batch: a single-batch availableNow drain's
#: final update per user equals the plain batch aggregate.
EXTENSION_ORACLE_SQL["q_stream_stateful"] = """
    SELECT user_id, count(*) AS n_events,
           CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us
    FROM events GROUP BY user_id
"""


def _inc_band_selects(sig_table: str) -> str:
    """Band rows for the incremental oracle over an arbitrary signature
    CTE (same banding as _BAND_SELECTS, parameterized table)."""
    return "\n        UNION ALL ".join(
        ("SELECT doc, {b} AS band_id, {key} AS band_key FROM {t}"
         " WHERE mh_0 < " + str(MINHASH_P)).format(
            b=b,
            t=sig_table,
            key=" || ',' || ".join(
                f"CAST(mh_{j} AS VARCHAR)"
                for j in range(
                    b * MINHASH_ROWS_PER_BAND,
                    (b + 1) * MINHASH_ROWS_PER_BAND,
                )
            ),
        )
        for b in range(MINHASH_BANDS)
    )


#: Incremental dedup: the signature/banding SQL is generated from the same
#: constants as the batch minhash oracle, applied to the corpus/new split.
EXTENSION_ORACLE_SQL["q_dedup_incremental"] = f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    ), newdocs AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
    ), th_c AS (
        {_th_table_sql("corpus")}
    ), th_n AS (
        {_th_table_sql("newdocs")}
    ), sig_c AS MATERIALIZED (
        SELECT doc, {_MH_EXPRS} FROM th_c
    ), sig_n AS MATERIALIZED (
        SELECT doc, {_MH_EXPRS} FROM th_n
    ), bands_c AS (
        {_inc_band_selects("sig_c")}
    ), bands_n AS (
        {_inc_band_selects("sig_n")}
    ), pairs AS (
        SELECT DISTINCT y.doc AS new_doc, x.doc AS old_doc
        FROM bands_c x JOIN bands_n y
          ON x.band_id = y.band_id AND x.band_key = y.band_key
    ), scored AS (
        SELECT p.new_doc, p.old_doc,
               CAST({_AGREE} AS DOUBLE) / {float(len(MINHASH_COEFFS))}
                   AS est
        FROM pairs p
        JOIN sig_c sa ON p.old_doc = sa.doc
        JOIN sig_n sb ON p.new_doc = sb.doc
    ), ranked AS (
        SELECT new_doc, old_doc, est,
               row_number() OVER (
                   PARTITION BY new_doc
                   ORDER BY est DESC, old_doc ASC) AS rn,
               count(*) OVER (PARTITION BY new_doc) AS n_candidates
        FROM scored
    ), best AS (
        SELECT new_doc, old_doc AS best_match, est AS best_est,
               n_candidates
        FROM ranked WHERE rn = 1
    ), cmd5 AS (
        SELECT DISTINCT md5(text) AS m FROM corpus
    )
    SELECT n.doc_id,
           (c.m IS NOT NULL) AS is_exact_dup,
           b.best_match, b.best_est,
           CAST(coalesce(b.n_candidates, 0) AS BIGINT) AS n_candidates
    FROM newdocs n
    LEFT JOIN cmd5 c ON md5(n.text) = c.m
    LEFT JOIN best b ON n.doc_id = b.new_doc
"""

EXTENSION_ORACLE_SQL["q_range_frame"] = f"""
    SELECT event_id, user_id,
           CAST({_FD_SEC} AS BIGINT) AS ts_s,
           count(*) OVER w AS hour_cnt,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE)
               AS hour_sum
    FROM events
    WINDOW w AS (
        PARTITION BY user_id
        ORDER BY CAST({_FD_SEC} AS BIGINT)
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""
