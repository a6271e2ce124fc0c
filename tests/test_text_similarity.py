"""Text-analysis + similarity operator semantics on crafted inputs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_token_counts_regex_semantics(spark):
    from financial_big_data_exp_4_spark.operators import token_counts

    docs = spark.createDataFrame(
        [(0, "a b,c! d"), (1, "  leading  spaces "), (2, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert rows[0]["ws_tokens"] == 3          # 'a' 'b,c!' 'd' → \S+ runs
    assert rows[0]["bpe_tokens"] == 6         # a b , c ! d
    assert rows[1]["ws_tokens"] == 2          # no empty tokens from padding
    assert rows[2]["ws_tokens"] == 0 and rows[2]["bpe_tokens"] == 0


def test_text_quality_zero_guards_and_ranges(spark):
    from financial_big_data_exp_4_spark.operators import text_quality

    docs = spark.createDataFrame(
        [(0, ""), (1, "the quick fox"), (2, "!!!!")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_quality(docs).collect()}
    empty = rows[0]
    assert empty["n_tokens"] == 0 and empty["mean_token_len"] == 0.0
    assert empty["stopword_ratio"] == 0.0  # 0/0 guarded
    assert rows[1]["stopword_ratio"] > 0   # 'the' present
    assert rows[2]["punct_ratio"] == 1.0
    for r in rows.values():
        assert 0.0 <= r["quality_score"] <= 1.0


def test_language_id_prefers_profile_hits(spark):
    from financial_big_data_exp_4_spark.operators import language_id

    docs = spark.createDataFrame(
        [
            (0, "the cat and the dog of a house", "en"),
            (1, "der hund und die katze ist nicht da", "de"),
            (2, "zzz qqq www", "en"),  # no profile hits → tie → 'de' (alpha)
        ],
        "doc_id long, text string, lang string",
    )
    rows = {r["doc_id"]: r for r in language_id(docs).collect()}
    assert rows[0]["lang_pred"] == "en"
    assert rows[1]["lang_pred"] == "de"
    assert rows[2]["lang_pred"] == "de" and rows[2]["lang_score"] == 0

    # stable output schema: an unlabeled corpus still emits (doc_id,
    # lang, lang_pred, lang_score) with lang NULL, so labeled and
    # unlabeled results union cleanly
    unlabeled = spark.createDataFrame(
        [(3, "the cat sat")], "doc_id long, text string"
    )
    u = language_id(unlabeled)
    assert u.columns == language_id(docs).columns
    both = language_id(docs).unionByName(u).collect()
    assert {r["doc_id"]: r["lang"] for r in both}[3] is None


def test_doc_fingerprint_short_doc_guard(spark):
    from financial_big_data_exp_4_spark.operators import doc_fingerprint

    docs = spark.createDataFrame(
        [(0, "short"), (1, "long enough text for shingles")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in doc_fingerprint(docs).collect()}
    assert rows[0]["min_shingle_hash"] is None and rows[0]["n_selected"] == 0
    assert rows[1]["min_shingle_hash"] is not None


def test_cosine_topk_ranks_true_neighbor_first(spark):
    from financial_big_data_exp_4_spark.operators import cosine_topk_bruteforce

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),   # nearest to probe 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),   # antipode → lowest similarity
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = cosine_topk_bruteforce(df, n_probes=1, k=3).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert [r["vec_id"] for r in ranked] == [1, 2, 3]
    assert math.isclose(
        ranked[0]["cos_sim"], 0.99 / math.sqrt(0.99**2 + 0.1**2), rel_tol=1e-6
    )


def test_multimodal_metadata_plumbing(spark):
    import hashlib

    from financial_big_data_exp_4_spark.operators import multimodal_metadata

    docs = spark.createDataFrame(
        [(0, "héllo"), (1, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in multimodal_metadata(docs).collect()}
    assert rows[0]["n_bytes"] == len("héllo".encode())
    assert rows[0]["digest"] == hashlib.md5("héllo".encode()).hexdigest()
    assert rows[0]["img_w"] == rows[0]["n_bytes"] % 640
    assert rows[1]["n_bytes"] == 0


def test_multimodal_null_text_propagates_null(spark):
    """NULL text must behave like the oracle's NULL propagation: metadata
    emits the row with NULL n_bytes/dims/digest (not a crash or garbage
    long from NaN arithmetic), frame sampling emits zero rows (the
    oracle's range(0, NULL) unnests to nothing), and resize keeps the
    payload NULL."""
    from financial_big_data_exp_4_spark.operators.multimodal import (
        multimodal_metadata,
        resize_images,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(0, "real text"), (1, None)], "doc_id long, text string"
    )
    meta = {r["doc_id"]: r for r in multimodal_metadata(docs).collect()}
    assert meta[1]["n_bytes"] is None
    assert meta[1]["img_w"] is None and meta[1]["img_h"] is None
    assert meta[1]["digest"] is None
    assert meta[0]["n_bytes"] == 9  # non-null rows unaffected

    frames = sample_frames(docs).collect()
    assert {r["doc_id"] for r in frames} == {0}  # no frames for NULL

    resized = {r["doc_id"]: r for r in resize_images(docs).collect()}
    assert resized[1]["payload"] is None
    assert resized[0]["payload"] is not None


def test_decode_image_is_an_explicit_stub():
    import pytest

    from financial_big_data_exp_4_spark.operators import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_sample_frames_expansion(spark):
    import hashlib

    from financial_big_data_exp_4_spark.operators.multimodal import sample_frames

    docs = spark.createDataFrame(
        [(0, "abcdefgh"), (1, "")], "doc_id long, text string"
    )
    rows = sorted(
        sample_frames(docs).collect(), key=lambda r: (r["doc_id"], r["frame_idx"])
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # n_bytes=8 -> 8%4+1 = 1 frame; n_bytes=0 -> 1 frame
    assert len(by_doc[0]) == 1 and len(by_doc[1]) == 1
    d = hashlib.md5(b"abcdefgh").hexdigest()
    assert by_doc[0][0]["frame_hash"] == f"{d}-0"
    assert by_doc[0][0]["frame_off"] == 0


def test_resize_images_binary_roundtrip(spark):
    from financial_big_data_exp_4_spark.operators.multimodal import resize_images

    docs = spark.createDataFrame(
        [(0, "x" * 2000), (1, "short")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in resize_images(docs, 32, 32).collect()}
    target = 32 * 32 // 64
    assert len(rows[0]["payload"]) == target  # truncated
    assert len(rows[1]["payload"]) == target  # zero-padded
    assert bytes(rows[1]["payload"]).startswith(b"short")
    assert rows[0]["out_w"] == 32 and rows[0]["out_h"] == 32


def test_cosine_pandas_matches_fold_within_fp_noise(spark, sf_dir):
    """The vectorized production scorer and the oracle-parity fold agree
    to FP-summation noise (different summation orders, same math)."""
    from pyspark.sql import functions as F

    from financial_big_data_exp_4_spark.operators.similarity import (
        cosine,
        cosine_pandas,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = emb.select(
        (F.col("vec_id") + 1).alias("ib"), F.col("embedding").alias("eb")
    )
    pairs = a.join(b, a.ia == b.ib)
    both = pairs.select(
        cosine(F.col("ea"), F.col("eb")).alias("exact"),
        cosine_pandas(F.col("ea"), F.col("eb")).alias("fast"),
    ).collect()
    assert both
    assert max(abs(r["exact"] - r["fast"]) for r in both) < 1e-9


def test_cosine_topk_layout_invariant(spark, sf_dir):
    """The two-level top-k pre-reduction keys on spark_partition_id, so
    the declared output must be identical on any physical layout."""
    from financial_big_data_exp_4_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )
    from financial_big_data_exp_4_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    outs = []
    for layout in (emb.repartition(3), emb.repartition(11), emb.coalesce(1)):
        outs.append(
            sorted(
                (r["probe_id"], r["rank"], r["vec_id"], r["cos_sim"])
                for r in cosine_topk_bruteforce(layout).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_kmeans_ivf_recovers_blob_neighbors(spark):
    """Learned-quantizer ANN on data with real cluster structure: 4
    well-separated angular blobs. Any reasonable k-means run separates
    them, so nprobe=1 must already recover the exact top-k (recall 1.0)
    — the neighbors live in the probe's own learned cell. This pins the
    full path: unit-normalize, fit, JVM assign, home-cell-first probe
    selection, exact cosine scoring."""
    import random

    from financial_big_data_exp_4_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf_kmeans,
    )

    rng = random.Random(7)
    dim, per_blob = 16, 25
    rows = []
    for blob in range(4):
        center = [0.0] * dim
        # orthogonal blob axes → inter-blob cosine ≈ 0, intra ≈ 1
        center[blob * 4] = 10.0
        for j in range(per_blob):
            vec = [
                c + rng.uniform(-0.5, 0.5) for c in center
            ]
            rows.append((blob * per_blob + j, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    truth = {
        (r["probe_id"], r["vec_id"])
        for r in cosine_topk_bruteforce(emb, n_probes=3, k=5).collect()
    }
    approx = {
        (r["probe_id"], r["vec_id"])
        for r in cosine_topk_ivf_kmeans(
            emb, n_probes=3, k=5, n_cells=4, nprobe=1
        ).collect()
    }
    assert approx == truth  # recall 1.0 on separable structure


def test_cosine_zero_norm_yields_null_not_abort(spark):
    """Zero embeddings are a certainty at corpus scale (empty docs, dead
    encoder rows): the whole cosine family must yield NULL — DuckDB's
    x/0.0 — instead of ANSI DIVIDE_BY_ZERO, and the pair/top-k/ANN
    operators must stay total. Found by tools/fuzz_correctness.py (zero
    vectors crashed all 7 embedding queries)."""
    from financial_big_data_exp_4_spark.operators.similarity import (
        cosine,
        cosine_pandas,
        cosine_topk_bruteforce,
        cosine_topk_ivf_kmeans,
        embedding_neardup_pairs,
    )

    rows = [(i, [float(i + d) for d in range(4)]) for i in range(1, 8)]
    rows.append((8, [0.0, 0.0, 0.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    zero_vs_any = emb.alias("a").crossJoin(emb.alias("b")).where(
        (F.col("a.vec_id") == 8) & (F.col("b.vec_id") == 1)
    )
    for fn in (cosine, cosine_pandas):
        [r] = zero_vs_any.select(
            fn(F.col("a.embedding"), F.col("b.embedding")).alias("cs")
        ).collect()
        assert r["cs"] is None, fn.__name__

    # top-k ranks the zero vector last (NULLS LAST) and never aborts
    topk = cosine_topk_bruteforce(emb, n_probes=2, k=10).collect()
    nulls = [r for r in topk if r["cos_sim"] is None]
    assert all(
        r["rank"] == max(x["rank"] for x in topk if x["probe_id"] == r["probe_id"])
        for r in nulls
    )
    # pair mining: the zero vector simply never pairs (NULL >= t is false)
    pairs = embedding_neardup_pairs(emb, threshold=0.0, stride=3).collect()
    assert all(8 not in (r["vec_a"], r["vec_b"]) for r in pairs)
    # learned-quantizer ANN excludes the direction-less vector from the
    # index and still answers
    out = cosine_topk_ivf_kmeans(emb, n_probes=2, k=3, n_cells=2, nprobe=2)
    assert all(r["vec_id"] != 8 for r in out.collect())


def test_kmeans_ann_proof_single_indexable_probe(spark, tmp_path):
    """q_embed_ann_kmeans's proof on the nastiest in-contract corpus: ONE
    indexable vector (which is itself a probe) among zero-norm rows. The
    candidate set is empty, the brute-force baseline is empty, and the
    oracle still expects one all-TRUE proof row for the indexable probe
    (round-6 ADVICE: the old corpus-wide navail bound emitted zero rows
    here). Also pins the nprobe<cells reachable bound: has_k must judge
    against the candidates the PROBED cells can reach, via the
    operator's n_cand column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from financial_big_data_exp_4_spark.plans.extensions import (
        q_embed_ann_kmeans,
    )

    dim = 8
    tbl = pa.Table.from_pydict(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [[1.0] + [0.0] * (dim - 1), [0.0] * dim, [0.0] * dim],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 0, 1], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    rows = q_embed_ann_kmeans(spark, str(tmp_path)).collect()
    assert [r["probe_id"] for r in rows] == [1]
    [r] = rows
    assert r["has_k"] and r["ranks_contiguous"]
    assert r["sims_bounded"] and r["best_le_exact"]


def test_adaptive_sqrt_stride_ivf(spark):
    """stride=None picks ⌈√N⌉ — C ≈ √N centroids balance assignment
    (N^1.5) against cell size (√N), the corpus-scale configuration the
    fixed-stride declared queries can't use (their oracle needs the
    closed-form constant). Correctness must be unchanged in kind: on
    blob-structured data the probe's own cell still recovers its
    blob-mates."""
    import random

    from financial_big_data_exp_4_spark.operators.similarity import (
        _sqrt_stride,
        cosine_topk_ivf,
        embedding_neardup_pairs,
    )

    rng = random.Random(11)
    dim, per_blob = 16, 30
    rows = []
    for blob in range(3):
        center = [0.0] * dim
        center[blob * 5] = 10.0
        for j in range(per_blob):
            rows.append(
                (blob * per_blob + j,
                 [c + rng.uniform(-0.4, 0.4) for c in center])
            )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    assert _sqrt_stride(emb) == 10  # ceil(sqrt(90))

    out = cosine_topk_ivf(emb, n_probes=2, k=5, stride=None).collect()
    by_probe = {}
    for r in out:
        by_probe.setdefault(r["probe_id"], []).append(r["vec_id"])
    # probes 0 and 1 are blob-0 members; intra-blob cosine ≈ 1 dominates
    for p, vids in by_probe.items():
        assert vids, p
        assert all(v < per_blob for v in vids), (p, vids)

    # pair mining with the adaptive stride: intra-blob near-dups found,
    # never a cross-blob pair at a high threshold
    pairs = embedding_neardup_pairs(emb, threshold=0.9, stride=None).collect()
    assert pairs
    assert all(
        r["vec_a"] // per_blob == r["vec_b"] // per_blob for r in pairs
    )


def test_kmeans_ann_candidate_bounds_are_nonvacuous(spark):
    """The proof's lower bound must have teeth on structured data:
    every probe's home cell holds its blob-mates, so n_home_cand ≥ 1 and
    n_cand ≥ n_home_cand — a search regression that empties or starves
    the candidate pool breaks the inequality instead of sailing through
    trivially-true claims (round-7 review)."""
    import random

    from financial_big_data_exp_4_spark.operators.similarity import (
        cosine_topk_ivf_kmeans,
    )

    rng = random.Random(5)
    dim, per_blob = 16, 25
    rows = []
    for blob in range(4):
        center = [0.0] * dim
        center[blob * 4] = 10.0
        for j in range(per_blob):
            rows.append(
                (blob * per_blob + j,
                 [c + rng.uniform(-0.5, 0.5) for c in center])
            )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk_ivf_kmeans(
        emb, n_probes=3, k=5, n_cells=4, nprobe=1
    ).collect()
    assert out
    for r in out:
        assert r["n_home_cand"] >= 1, r  # blob-mates share the home cell
        assert r["n_cand"] >= r["n_home_cand"], r
        assert r["vec_id"] is not None  # no stub rows on this corpus


def test_sqrt_stride_formula_matches_duckdb():
    """The adaptive stride must be IDENTICAL on both engines: Python's
    integer-exact isqrt(n-1)+1 vs DuckDB's greatest(1, ceil(sqrt(n))).
    Double sqrt is correctly rounded, so the two can only diverge for
    n = k²+1 with k > 2^26 — far beyond any gate corpus; pin the full
    plausible range plus perfect-square boundaries."""
    import math

    import duckdb

    con = duckdb.connect()

    def py_stride(n: int) -> int:
        return max(1, math.isqrt(max(n - 1, 0)) + 1) if n else 1

    samples = [0, 1, 2, 3, 4, 5, 90, 100, 499, 500, 2000, 2001]
    samples += [k * k for k in (7, 45, 316, 1000)]
    samples += [k * k + 1 for k in (7, 45, 316, 1000)]
    samples += [10**6, 10**6 + 1, 10**7]
    for n in samples:
        [(duck,)] = con.execute(
            f"SELECT greatest(1, CAST(ceil(sqrt({n})) AS BIGINT))"
        ).fetchall()
        assert duck == py_stride(n), (n, duck, py_stride(n))


def test_lsh_plane_weights_decorrelated():
    """The plane weight vectors must be near-independent: the original
    bare Weyl stream (i·K % P) made plane p+1 a shift of plane p
    (mean |corr| 0.35), inflating random-pair band collisions ~10⁴× and
    turning the banded join quadratic in disguise (round 7: 12.7M
    spurious Hamming≤2 edges among 200k random vectors). Recompute the
    weight matrix from the same SQL formula and pin the correlation
    budget — a future constant or formula change that reintroduces
    structure fails here without any Spark session."""
    import numpy as np

    from financial_big_data_exp_4_spark.functions.core import (
        HASH_MODULUS as P,
        HASH_MULTIPLIER as K,
    )
    from financial_big_data_exp_4_spark.operators.similarity import (
        LSH_DIM,
        LSH_PLANES,
    )

    def weight(i: int) -> int:
        h1 = (i * K) % P
        return ((h1 * h1 + i) % P) * K % P % 2001 - 1000

    W = np.array(
        [
            [weight(p * LSH_DIM + d) for d in range(LSH_DIM)]
            for p in range(LSH_PLANES)
        ],
        dtype=np.float64,
    )
    C = np.corrcoef(W)
    off = np.abs(C[np.triu_indices(LSH_PLANES, 1)])
    assert off.mean() < 0.15, off.mean()
    assert off.max() < 0.6, off.max()

    # and the formula here must BE the shipped formula (no silent drift)
    from financial_big_data_exp_4_spark.operators.similarity import (
        _lsh_weight_sql,
    )

    import duckdb

    con = duckdb.connect()
    for i in (0, 1, 63, 64, 2047):
        [(sql_w,)] = con.execute(
            f"SELECT {_lsh_weight_sql(str(i))}"
        ).fetchall()
        assert sql_w == weight(i), (i, sql_w, weight(i))

    # the literal weight array the hot path ships (round-9: weights are
    # precomputed once, not re-derived per row) must be the same formula
    from financial_big_data_exp_4_spark.operators.similarity import (
        _LSH_DIM_CAP,
        _lsh_weight_py,
    )

    for i in (0, 1, 63, 64, 2047, LSH_PLANES * _LSH_DIM_CAP - 1):
        assert _lsh_weight_py(i) == weight(i), i
        [(sql_w,)] = con.execute(
            f"SELECT {_lsh_weight_sql(str(i))}"
        ).fetchall()
        assert _lsh_weight_py(i) == sql_w, i


def test_png_codec_roundtrip_all_color_types():
    """The built-in pure-stdlib PNG codec: encode → decode is the
    identity for every supported color type (gray, gray+alpha, RGB,
    RGBA), and the decoder handles every PNG filter type (an Up/Sub/
    Average/Paeth-filtered stream from a reference encoder must
    reconstruct the same pixels). Filters are exercised by re-filtering
    our own scanlines through each predictor and checking the decode."""
    import numpy as np

    from financial_big_data_exp_4_spark.operators.multimodal import (
        _png_decode,
        _png_encode,
    )

    rng = np.random.default_rng(13)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(11, 7, ch), dtype=np.uint8)
        out = _png_decode(_png_encode(arr))
        assert out.shape == (11, 7, ch)
        assert (out == arr).all(), f"channels={ch}"


def test_png_decoder_handles_all_filter_types():
    """Hand-build a PNG whose scanlines use filters 0-4 (the encoder
    only emits 0, so this exercises the unfilter paths a real-world
    Pillow/libpng stream would contain)."""
    import struct
    import zlib

    import numpy as np

    from financial_big_data_exp_4_spark.operators.multimodal import (
        _PNG_MAGIC,
        _png_decode,
    )

    rng = np.random.default_rng(7)
    h, w, ch = 5, 6, 3
    arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8).astype(int)
    stride = w * ch
    flat = arr.reshape(h, stride)
    lines = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=int)
        filt = np.zeros(stride, dtype=int)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
            filt[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([f]) + bytes(filt.astype(np.uint8)))

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    png = (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    out = _png_decode(png)
    assert (out == arr.astype(np.uint8)).all()


def test_resize_image_payloads_real_pixels(spark):
    """The REAL resize path end-to-end through mapInPandas: generated
    PNGs in, resized PNGs out — decoded output must equal the numpy
    nearest-neighbor reference, NULL payload stays NULL, and source
    dims ride along."""
    import numpy as np

    from financial_big_data_exp_4_spark.operators.multimodal import (
        _png_decode,
        _png_encode,
        _resize_nearest,
        resize_image_payloads,
    )

    rng = np.random.default_rng(99)
    imgs = {
        1: rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8),
        2: rng.integers(0, 256, size=(9, 5, 1), dtype=np.uint8),
    }
    df = spark.createDataFrame(
        [(k, bytearray(_png_encode(v))) for k, v in imgs.items()]
        + [(3, None)],
        "doc_id long, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in resize_image_payloads(df, out_w=16, out_h=12).collect()
    }
    assert rows[3].payload is None and rows[3].src_w is None
    for k, src in imgs.items():
        r = rows[k]
        assert (r.src_w, r.src_h) == (src.shape[1], src.shape[0])
        got = _png_decode(bytes(r.payload))
        want = _resize_nearest(src, 16, 12)
        assert got.shape == (12, 16, src.shape[2])
        assert (got == want).all()


def test_decode_image_raises_loudly_on_unknown_format():
    import pytest as _pytest

    from financial_big_data_exp_4_spark.operators.multimodal import (
        decode_image,
    )

    try:
        import PIL  # noqa: F401

        _pytest.skip("Pillow present: ladder decodes via PIL instead")
    except ImportError:
        pass
    with _pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 not-actually-decodable")


def test_ann_ivf_serves_from_memoized_index(spark, sf_dir):
    """The declared stride-IVF query must SERVE from the session-memoized
    index artifact, not rebuild the N^1.5 assignment per call: after one
    invocation (which builds + persists the index), the next plan's scan
    side must read the materialized artifact leaf (Scan ExistingRDD) and
    contain no crossJoin-against-centroids stage (round-13: the per-pass rebuild was the largest line
    in the 100x scale gate, 43.6 s warm -> 0.63 s served)."""
    from financial_big_data_exp_4_spark.plans import REFERENCE_QUERIES

    fn = REFERENCE_QUERIES["q_embed_ann_ivf"]
    fn(spark, sf_dir).collect()  # builds + memoizes the index
    plan = (
        fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    # round 14: the memoized artifact is an eager localCheckpoint, so
    # the served plan reads a Scan ExistingRDD leaf (plan truncated at
    # the artifact boundary — no build plan is even printed). The whole
    # plan is live, so the no-rebuild assertions apply to all of it.
    assert "Scan ExistingRDD" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "FileScan parquet" not in plan, plan


def test_served_ivf_topk_plan_streams_the_index(spark):
    """Plan-shape guard for the index-SERVING path (r13 VERDICT #9):
    cosine_topk_ivf over a materialized ivf_assignments artifact must
    stream the big assigned side from its cache straight into a
    BroadcastHashJoin against the tiny probe set, with the window's
    partitionBy as the ONE shuffle in the query:

    * exactly 1 shuffle Exchange above the cache (the probe_id window),
    * a BroadcastHashJoin, never a SortMergeJoin (an SMJ would shuffle
      AND sort the whole corpus per query — the silent regression class
      the propagate-loop guard caught in r13),
    * the assigned side read from the checkpointed artifact leaf
      (Scan ExistingRDD — served, not rebuilt).
    """
    import random
    import re

    from pyspark.sql import functions as F

    from financial_big_data_exp_4_spark.operators.similarity import (
        cosine_topk_ivf,
        ivf_assignments,
    )
    from financial_big_data_exp_4_spark.session import (
        memo_df,
        scoped_sql_conf,
    )

    random.seed(7)
    emb = spark.createDataFrame(
        [(i, [random.random() for _ in range(8)]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )
    with scoped_sql_conf(spark, {"spark.sql.adaptive.enabled": "false"}):
        assigned = memo_df(
            spark, ("test_served_ivf", "t"), lambda: ivf_assignments(emb)
        )
        out = cosine_topk_ivf(emb, assigned=assigned)
        assert out.count() > 0
        plan = out._jdf.queryExecution().executedPlan().toString()
    # round 14: the served artifact is a localCheckpoint leaf (Scan
    # ExistingRDD) — the printed plan contains no cached build plan, so
    # the shape assertions cover the ENTIRE executed plan.
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Scan ExistingRDD" in plan, plan


def test_png_decoder_expands_palette_plte_and_trns():
    """Palette (color type 3) PNGs decode through the PLTE to RGB, and a
    tRNS chunk adds per-entry alpha (entries past its length opaque per
    spec) — closing the stdlib codec's last loud gap (r13 VERDICT #10)."""
    import struct
    import zlib

    import numpy as np

    from financial_big_data_exp_4_spark.operators.multimodal import (
        _PNG_MAGIC,
        _png_decode,
    )

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", crc)
        )

    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    scan = b"".join(b"\x00" + bytes(row) for row in idx)
    base = _PNG_MAGIC + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
    ) + chunk(b"PLTE", palette.tobytes())
    tail = chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")

    rgb = _png_decode(base + tail)
    assert rgb.shape == (2, 4, 3)
    assert (rgb == palette[idx]).all()

    rgba = _png_decode(base + chunk(b"tRNS", bytes([10, 200])) + tail)
    assert rgba.shape == (2, 4, 4)
    assert (rgba[:, :, :3] == palette[idx]).all()
    alpha_lut = np.array([10, 200, 255, 255], dtype=np.uint8)
    assert (rgba[:, :, 3] == alpha_lut[idx]).all()


def test_resize_image_payloads_honors_custom_column_names(spark):
    """Non-default id_col/payload_col must survive the pre-boundary
    rename (r13 ADVICE: the pandas closure indexed the caller names and
    KeyError'd executor-side for any non-default caller)."""
    import numpy as np

    from financial_big_data_exp_4_spark.operators.multimodal import (
        _png_decode,
        _png_encode,
        resize_image_payloads,
    )

    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(77, bytearray(_png_encode(src)))],
        "image_id long, img_bytes binary",
    )
    row = resize_image_payloads(
        df, out_w=4, out_h=4, id_col="image_id", payload_col="img_bytes"
    ).collect()[0]
    assert row.doc_id == 77
    assert _png_decode(bytes(row.payload)).shape == (4, 4, 3)
