"""Embedding similarity search over ``embeddings.embedding``
(``array<float>``): brute-force cosine top-k baseline + IVF-bucketed scale
path (BASELINE north star).

100 TB design notes
-------------------
* The probe set is always **broadcast** — scoring is a map-side
  broadcast-nested-loop over the big side; the big side is never shuffled
  for scoring. Top-k then shuffles only ``(probe, candidate, score)``
  rows, partitioned by probe.
* Dot products are computed with ``zip_with`` + ``aggregate`` — native
  JVM higher-order functions, left-to-right fold, so the value is
  bit-identical to the oracle's sequential ``list_reduce`` sum. No Python,
  no Arrow round-trip.
* The IVF variant assigns every vector to its nearest centroid once
  (map-side vs broadcast centroids), then probes search only their own
  cell: cost drops from O(N) to O(N/C) per probe. TWO centroid sources
  ship: the declared teaching path draws a deterministic ⌈√N⌉-stride
  systematic sample (closed-form for the scalar-subquery oracle, N^1.5
  total by design — budget exponent 1.5 in tools/scale_bench.py), and
  :func:`cosine_topk_ivf_kmeans` learns a fixed-C k-means quantizer —
  the linear-cost production default at scale (measured: 0.98s vs 53s
  warm at the 100× fixture, recall@3 = 1.0 on both paths, RECALL/SCALE
  artifacts). The *plan shape* (assign map-side, search cell-local) is
  identical in both.
* Brute-force top-k is **two-level**: a first window keyed by
  ``(probe_id, spark_partition_id())`` reduces each input partition to at
  most k rows per probe *before* the per-probe window — so the final
  window (whose key space is only |probes|, the skew point at scale) sees
  ≤ k·partitions rows, not N. The per-(probe, partition) top-k is always
  a superset of the global top-k, so the result is identical on any
  partition layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOPK = 10
#: Fixed fallback stride for the stride-sampled IVF paths (every 50th
#: vector is a "centroid", deterministic sample). The DECLARED queries
#: use the adaptive ⌈√N⌉ stride instead (``stride=None`` →
#: :func:`_sqrt_stride`; oracle computes the same via scalar subquery):
#: a constant stride means C = N/stride centroids and an N²/stride
#: assignment — measured slope ~102× at 30× data before the round-7
#: switch. Keep the constant only for tests that pin a specific layout.
IVF_CENTROID_STRIDE = 50

#: Signed-random-projection (hyperplane) LSH: number of planes = signature
#: bits; collision probability for two vectors is (1 − θ/π)^planes
#: (Charikar 2002), the cosine sibling of the MinHash band trade-off.
#: 32 planes (2 bands × 16 bits), not 16 (2 × 8): the round-7 scale
#: measurement (tools/scale_bench.py, 1× vs 10× an sf0.1-shaped corpus)
#: showed the 8-bit band join growing QUADRATICALLY — 256 possible keys
#: per band means bucket sizes grow linearly with the corpus and the
#: band self-join as its square (q_triangle_count warm slope 20.8× at
#: 10× data). 16-bit bands give a 65k keyspace per band, so random
#: collisions drop ~2⁸× per band and the quadratic onset defers ~256×
#: in corpus size; genuinely near-duplicate vectors still agree on all
#: planes and keep colliding. For corpora past that onset, cap buckets
#: via ``hyperplane_neardup_pairs(max_bucket_size=...)``.
LSH_PLANES = 32
#: Fixture embedding dimensionality — used only by tests/docs; the
#: signature expression reads ``size(embedding)`` at runtime, so a
#: regenerated fixture with a different dim keeps working (the weight
#: stream just extends/truncates with it, deterministically).
LSH_DIM = 64
#: The engine's single multiplicative-hash constant pair (see
#: functions.core) — the hyperplane weights are derived, not sampled, so
#: signatures are deterministic across engines/runs with no stored model.
from financial_big_data_exp_4_spark.functions.core import (
    HASH_MODULUS as _LSH_HASH_P,
    HASH_MULTIPLIER as _LSH_KNUTH,
)

# single-slot scoped cache shared engine-wide (moved to session.py so the
# LSH band joins in operators/dedup.py use the same eviction slot)
from financial_big_data_exp_4_spark.session import (  # noqa: E402
    persist_scoped as _persist_scoped,
    rebalance_for_cpu as _rebalance,
)
IVF_TOPK = 3
#: Production near-dup mining would use ~0.95; the fixture embeddings are
#: random (max observed in-cell cosine ≈ 0.48), so the declared query uses
#: a threshold that actually yields pairs to check. The operator is
#: threshold-parameterized either way.
NEARDUP_COS_THRESHOLD = 0.35


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product of two float arrays (bit-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine with NULL for zero-norm inputs (whole cosine family): a
    zero-norm vector makes cosine undefined, and at corpus scale zero
    embeddings are a certainty (empty documents, dead encoder rows), so
    the division is ``try_divide`` — NULL, never a DIVIDE_BY_ZERO abort
    under Spark 4's ANSI mode. This is exactly DuckDB's float
    ``x / 0.0 → NULL``, so engine and oracle stay in lockstep without
    any oracle change, and thresholded consumers (``cos >= t``) drop
    zero-norm pairs identically on both sides. Found by
    ``tools/fuzz_correctness.py`` (zero vectors crashed all 7 embedding
    queries)."""
    return F.try_divide(dot(a, b), F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm(a: Column) -> Column:
    """L2 norm via the same sequential fold as :func:`dot`."""
    return F.sqrt(dot(a, a))


def cosine_pandas(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine via numpy — the 100 TB *production* scorer.

    The declared queries keep the native sequential fold because the
    differential gate requires bit-identical doubles vs DuckDB's
    ``list_reduce`` and numpy's SIMD/pairwise summation rounds
    differently (agreement is ~1e-12 relative, not exact). When
    cross-engine bit-parity is not a requirement, this path scores
    batches ~10× faster than the interpreted fold; see
    ``tests/test_text_similarity.py`` for the differential bound.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
        # float64 accumulation — the embeddings are float32 and the fold
        # casts each element to double before multiplying
        va = np.stack(xs.to_numpy()).astype(np.float64)
        vb = np.stack(ys.to_numpy()).astype(np.float64)
        num = (va * vb).sum(axis=1)
        den = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
        # zero-norm -> NULL (nullable Float64 -> Arrow null), matching
        # the native path's try_divide contract
        out = np.divide(num, den, out=np.full_like(num, np.nan),
                        where=den != 0)
        return pd.Series(out, dtype="Float64").mask(den == 0)

    return _cos(a, b)


def cosine_prenormed(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from precomputed norms: ``dot(a,b) / (norm_a * norm_b)`` —
    the identical expression tree to :func:`cosine` (sqrt(dot(x,x)) is
    just factored out), so values stay bit-identical to the oracle while
    each pair costs ONE fold instead of three. Materialize the norms as
    real columns (non-cheap aliases survive CollapseProject) — measured
    ~3× on the IVF/near-dup queries at sf0.1. ``try_divide`` for the
    same zero-norm NULL contract as :func:`cosine`."""
    return F.try_divide(dot(a, b), norm_a * norm_b)


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Per-vector int8-style scalar quantization (SQ8) summary — the
    standard vector-store compression: map each element to
    ``floor((x − min)/(max − min) · 255 + 0.5)`` (floor of +0.5 is
    round-half-up spelled so both engines agree; Spark's round() and
    DuckDB's round() disagree only on ties, which the spelling removes)
    and prove the reconstruction bound row-wise.

    Output is SCALARS only (oracle hash-safety — list renderings
    differ): (vec_id, n_dims, q_lo/q_hi = min/max code, q_sum = code
    sum, recon_ok = max |x − dequant(q)| ≤ scale/510·(1+1e−9)+1e−12 —
    the SQ8 half-step error bound with float-rounding slack). A
    constant (or zero) vector has scale 0 → every code 0 and
    reconstruction is exact by convention; the CASE's NULL-condition →
    ELSE semantics make that branch identical on both engines. All
    arithmetic is float32→float64 promotion (exact) then shared-order
    IEEE double ops, so codes hash bit-for-bit against the SQL oracle.
    100 TB shape: map-only over the vectors, no shuffle, no UDF —
    the one groupBy-free pass a quantization stage should be.
    Contract: embedding elements are non-NULL (the fixture schema);
    a whole-NULL embedding row propagates NULL through every output.

    The per-row min/max and the code array are MATERIALIZED as real
    columns between stages (non-cheap aliases survive CollapseProject):
    splicing ``array_min(e)`` directly into the higher-order-function
    lambdas re-evaluates it PER ELEMENT — HOFs are CodegenFallback and
    interpret the lambda body per element, so the spliced form was
    O(d²) per row (measured 12.3 s → sub-second at the 10× fixture;
    the same trap :func:`..functions.core.bind_once` documents)."""
    e = F.col("embedding")
    staged = embeddings.select(
        "vec_id",
        "embedding",
        F.array_min(e).cast("double").alias("_mn"),
        F.array_max(e).cast("double").alias("_mx"),
    )
    mn, mx = F.col("_mn"), F.col("_mx")
    coded = staged.select(
        "vec_id",
        "embedding",
        "_mn",
        "_mx",
        F.transform(
            e,
            lambda x: F.when(
                (mx - mn) > 0,
                F.floor(
                    (x.cast("double") - mn) / (mx - mn) * F.lit(255.0)
                    + F.lit(0.5)
                ),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        ).alias("_q"),
    )
    q = F.col("_q")
    deq = lambda code: mn + code.cast("double") * (mx - mn) / F.lit(255.0)  # noqa: E731
    err = F.array_max(
        F.zip_with(
            e, q, lambda x, c: F.abs(x.cast("double") - deq(c))
        )
    )
    bound = (mx - mn) / F.lit(510.0) * F.lit(1.000000001) + F.lit(1e-12)
    return coded.select(
        "vec_id",
        F.size(e).cast("long").alias("n_dims"),
        F.array_min(q).alias("q_lo"),
        F.array_max(q).alias("q_hi"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda acc, c: acc + c
        ).alias("q_sum"),
        (err <= bound).alias("recon_ok"),
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    n_probes: int = 5,
    k: int = TOPK,
) -> DataFrame:
    """Exact cosine top-k: probes = ``vec_id < n_probes`` (broadcast),
    scored against every vector, ranked per probe.

    Output: (probe_id, vec_id, cos_sim, rank), rank 1..k, self excluded,
    ties broken by vec_id asc (total order → hash-stable).
    """
    probes = embeddings.where(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        norm(F.col("embedding")).alias("_pnorm"),
    )
    # fan the N×probes scoring fold across cores — the single-file fixture
    # scan is one row group = one task (no-op at real split counts)
    big = _rebalance(embeddings, "vec_id").select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("_enorm")
    )
    scored = (
        big.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            cosine_prenormed(
                F.col("probe_vec"),
                F.col("embedding"),
                F.col("_pnorm"),
                F.col("_enorm"),
            ).alias("cos_sim"),
            F.spark_partition_id().alias("_scan_part"),
        )
    )
    # Level 1 — per-(probe, input-partition) top-k. The key includes the
    # scan partition id, so the hash exchange spreads over
    # |probes|·|partitions| keys (no per-probe reducer hot spot) and the
    # filter reduces the final window's input to ≤ k rows per key. Any
    # superset of the true top-k per probe survives this level regardless
    # of physical layout, so the declared output is layout-invariant.
    w_local = Window.partitionBy("probe_id", "_scan_part").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    reduced = (
        scored.withColumn("_local_rank", F.row_number().over(w_local))
        .where(F.col("_local_rank") <= k)
        .drop("_local_rank", "_scan_part")
    )
    # Level 2 — the per-probe ranking, now over ≤ k·partitions rows.
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        reduced.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("probe_id", "vec_id", "cos_sim", "rank")
    )


def _sqrt_stride(embeddings: DataFrame) -> int:
    """Adaptive stride ≈ √N for the stride-sampled IVF paths.

    With a FIXED stride the centroid count C = N/stride grows linearly
    with the corpus, so the N×C assignment is N²/stride — fine for the
    oracle-checkable declared queries at fixture scale (the round-7
    scale bench measured it sub-linear at 10× because other costs still
    dominate), fatal at 10⁹ vectors. stride = ⌈√N⌉ gives C ≈ √N:
    assignment N^1.5, cell size ≈ √N, per-probe search ≈ √N, in-cell
    pair join Σcell² ≈ N^1.5 — the standard IVF compromise, uniform
    across every consumer. One count() action at plan-build time, the
    same model-build-time cost class as the kmeans variant's fit. The
    declared IVF/near-dup queries USE this path (``stride=None`` in
    `plans/extensions.py`); the DuckDB oracle stays in lockstep by
    computing the identical ⌈√N⌉ via a scalar subquery."""
    import math

    n = embeddings.count()
    return max(1, math.isqrt(max(n - 1, 0)) + 1) if n else 1


def _assign_cells(embeddings: DataFrame, stride: int | None) -> DataFrame:
    """Nearest-centroid cell id per vector (centroids = every ``stride``-th
    vector, broadcast; argmax via struct-max partial aggregation). Output
    carries the vector's precomputed L2 norm (``_norm``) so downstream
    pair scoring costs one fold per pair. ``stride=None`` → ⌈√N⌉ (see
    :func:`_sqrt_stride`), the scale path."""
    if stride is None:
        stride = _sqrt_stride(embeddings)
    cents = embeddings.where(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent_vec"),
        norm(F.col("embedding")).alias("_cnorm"),
    )
    # fan the N×C centroid scoring across cores (the groupBy(vec_id)
    # downstream reuses this exact clustering — no second exchange);
    # no-op whenever the scan already has ≥ cores partitions
    base = _rebalance(embeddings, "vec_id").select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("_norm")
    )
    sim_to_cent = cosine_prenormed(
        F.col("embedding"), F.col("cent_vec"), F.col("_norm"), F.col("_cnorm")
    )
    return (
        base.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "_norm",
            F.struct(
                sim_to_cent.alias("cs"), (-F.col("cent_id")).alias("neg_cent")
            ).alias("_sc"),
        )
        .groupBy("vec_id")
        .agg(
            F.first("embedding").alias("embedding"),
            F.first("_norm").alias("_norm"),
            F.max("_sc").alias("_best"),
        )
        .select(
            "vec_id",
            "embedding",
            "_norm",
            (-F.col("_best.neg_cent")).alias("cell"),
        )
    )


def ivf_assignments(
    embeddings: DataFrame, stride: int | None = None
) -> DataFrame:
    """The stride-IVF index build, exposed as a standalone artifact
    builder: (vec_id, embedding, _norm, cell) for every vector.

    This IS the expensive stage of every stride-IVF consumer — the N×C
    nearest-centroid scoring (N^1.5 at the ⌈√N⌉ default) — and it is a
    *build-once* artifact in any real ANN system (FAISS trains and adds
    to an index once, then serves queries from it). Callers that serve
    repeated queries memoize this per (session, corpus) via
    ``session.memo_df`` and hand the result to :func:`cosine_topk_ivf` /
    :func:`embedding_neardup_pairs` through their ``assigned`` parameter,
    so per-query cost is the cell-local search (≈ √N per probe), not an
    index rebuild. Not persisted here — the memo layer owns caching."""
    return _assign_cells(embeddings, stride)


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = NEARDUP_COS_THRESHOLD,
    stride: int | None = IVF_CENTROID_STRIDE,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, cell-bucketed (never
    all-pairs): vectors are assigned to IVF cells, candidate pairs are
    generated only *within* a cell (self-equi-join on the cell id), and
    pairs scoring ≥ threshold survive.

    This is the vector-space sibling of the MinHash band join: cost is
    Σ cell² instead of N², with recall bounded by the quantizer (a true
    near-dup pair split across cells is missed — the standard IVF
    trade-off, tuned via stride/nprobe). Output: (vec_a, vec_b, cos_sim).
    ``stride=None`` → ⌈√N⌉ cells-and-cell-size balance (the corpus-scale
    path; see :func:`_sqrt_stride`) — the declared query passes
    ``stride=None`` and the oracle computes the same ⌈√N⌉ via a scalar
    subquery.

    The assignment is persisted (scoped — see :func:`_persist_scoped`):
    both sides of the self-join read it, and without persistence Spark
    would run the N×C centroid scoring twice (at real scale you would
    checkpoint this stage for the same reason). Pass ``assigned`` (an
    already-materialized :func:`ivf_assignments` artifact) to skip the
    build entirely — the session-memoized index-serving path.
    """
    if assigned is None:
        assigned = _persist_scoped(_assign_cells(embeddings, stride))
    a = assigned.select(
        F.col("cell"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("_norm").alias("na"),
    )
    b = assigned.select(
        F.col("cell").alias("cell_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("_norm").alias("nb"),
    )
    return (
        a.join(b, (a.cell == b.cell_b) & (F.col("vec_a") < F.col("vec_b")))
        .select(
            "vec_a",
            "vec_b",
            cosine_prenormed(
                F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


#: Per-plane dot sign folded into an LSH_PLANES-bit signature, inside ONE
#: native expression tree (nested ``aggregate`` — the SimHash pattern):
#: weight(p, d) = ((p·D + d)·knuth mod P) mod 2001 − 1000, an integer in
#: [−1000, 1000] derived from the plane/dim index (max intermediate
#: 1024·knuth ≈ 2.7e12 ≪ 2^63). Dot products fold left-to-right, matching
#: the oracle's ``list_reduce`` bit-for-bit; integer weights are exact in
#: double, so the sign test is portable.
def _lsh_weight_sql(i_expr: str) -> str:
    """Plane-weight formula as SQL, shared VERBATIM by the Spark
    signature expression and the DuckDB oracle (same ints, same ops —
    bit-identical on both engines; int64-safe: h < P < 2³⁰ so h·h < 2⁶⁰
    and h·K < 2⁶²).

    Quadratic mix, not the bare Weyl stream: ``w(i) = i·K % P`` makes
    plane p+1's weight vector a SHIFT of plane p's within the same
    linear sequence — measured mean |corr| 0.35 between plane weight
    vectors, inflating random-pair band collisions ~10⁴× over
    independent planes (round-7: 12.7M spurious Hamming≤2 edges among
    200k random vectors; true independent planes give ~0). Squaring the
    first hash breaks the linearity: mean |corr| drops to 0.09 and
    P(ham ≤ 2) for random pairs to <1e-5, restoring the Σ bucket²
    linear-growth premise the banded join's scale story relies on."""
    h1 = f"(({i_expr}) * {_LSH_KNUTH} % {_LSH_HASH_P})"
    return (
        f"(({h1} * {h1} + ({i_expr})) % {_LSH_HASH_P})"
        f" * {_LSH_KNUTH} % {_LSH_HASH_P} % 2001 - 1000"
    )


def _lsh_weight_py(i: int) -> int:
    """The plane-weight formula of :func:`_lsh_weight_sql`, evaluated in
    Python — exact int arithmetic, bit-identical to the SQL (pinned by
    ``tests/test_text_similarity.py``). Lets the hot path carry the weights
    as a PRECOMPUTED LITERAL ARRAY instead of re-deriving every weight
    per row inside interpreted lambdas."""
    h1 = (i * _LSH_KNUTH) % _LSH_HASH_P
    return ((h1 * h1 + i) % _LSH_HASH_P) * _LSH_KNUTH % _LSH_HASH_P % 2001 - 1000


#: Highest embedding dimensionality served by the literal weight array;
#: wider vectors fall back to the per-row formula (correct, slower).
_LSH_DIM_CAP = 256

_LSH_WEIGHT_ARRAY = (
    "array("
    + ",".join(
        str(_lsh_weight_py(i)) for i in range(LSH_PLANES * _LSH_DIM_CAP)
    )
    + ")"
)


def _lsh_sig_body(weight_sql: str) -> str:
    return f"""aggregate(
  sequence(0, {LSH_PLANES - 1}),
  CAST(0 AS BIGINT),
  (acc, p) -> acc + CASE WHEN
    aggregate(
      sequence(1, size(embedding)),
      CAST(0.0 AS DOUBLE),
      (a, di) -> a + CAST(element_at(embedding, di) AS DOUBLE)
                     * CAST({weight_sql} AS DOUBLE)
    ) > 0.0
  THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END
)"""


#: Signature expression: rows with dim ≤ _LSH_DIM_CAP read their plane
#: weights from the precomputed literal (w(i) at 1-based position i+1 —
#: the index p·dim+di−1 is row-dim-dependent but the VALUE w(i) is not,
#: so one flat array serves every dim under the cap); wider rows derive
#: each weight with the original formula. Measured 2.3× on the
#: signature stage at 20k×64 (1.38s → 0.61s, identical outputs) — the
#: per-row formula re-derived all 2,048 weights inside interpreted
#: lambdas. The DuckDB oracle keeps the formula form; values are
#: bit-identical (Python int arithmetic is exact; pinned by test).
_LSH_SIG_EXPR = f"""IF(size(embedding) <= {_LSH_DIM_CAP},
  {_lsh_sig_body(f"element_at({_LSH_WEIGHT_ARRAY}, p * size(embedding) + di)")},
  {_lsh_sig_body(_lsh_weight_sql("p * size(embedding) + di - 1"))})"""


def hyperplane_signatures(embeddings: DataFrame) -> DataFrame:
    """Signed-random-projection LSH signature per vector — the
    cosine-space sibling of SimHash: vectors on the same side of all
    derived hyperplanes share a bucket, so near-duplicate mining becomes
    a bucket equi-join (Σ bucket², never N²), exactly like the MinHash
    band join and the IVF cell join.

    Map-only modulo the scale-up-only CPU rebalance: one
    nested-``aggregate`` expression per row (module constant), fanned
    across cores when the input scan is under-partitioned (the
    single-row-group fixture = one task; no-op at real split counts).
    The planes are *derived* from index arithmetic rather than sampled —
    no stored model, bit-reproducible anywhere. Output: (vec_id, sig);
    bucket on ``sig`` (or on bit-bands of it for higher recall)
    downstream.
    """
    return _rebalance(embeddings, "vec_id").select(
        "vec_id", F.expr(_LSH_SIG_EXPR).alias("sig")
    )


#: Hyperplane-LSH banding: 2 bands × 16 bits (LSH_PLANES/LSH_BANDS —
#: 8-bit bands were the round-7 quadratic blowup). Pigeonhole: two signatures
#: within Hamming 1 agree on at least one whole band, so candidate
#: generation is complete for radius ≤ (bands − 1).
LSH_BANDS = 2


def hyperplane_neardup_pairs(
    embeddings: DataFrame, max_bucket_size: int | None = None
) -> DataFrame:
    """Near-duplicate candidate pairs from banded hyperplane-LSH buckets,
    scored with signature Hamming distance and exact cosine — the
    embedding-space twin of the SimHash Hamming pairing: recall from the
    band join (pigeonhole-complete for Hamming ≤ bands−1), precision
    from the exact verify, never an all-pairs comparison (Σ bucket² per
    band, buckets concentrate near 1 for non-duplicate corpora).

    ``max_bucket_size`` is the corpus-scale escape hatch: past the
    16-bit bands' quadratic onset (see ``LSH_PLANES``), over-full
    ``(band_id, band_key)`` buckets are dropped before pairing — the
    same ``_cap_band_buckets`` guard (and recall semantics: a vector in
    a degenerate bucket can still pair through its other band) as the
    MinHash band join. Default ``None`` = exact declared semantics.

    The signature+norm projection is persisted (scoped): both self-join
    branches read it, and the plane fold is the expensive map stage.
    Duplicate candidates across bands collapse via DISTINCT (hamming and
    cosine are pair-functions, so the duplicate rows are value-identical).
    Output: (vec_a, vec_b, hamming, cos_sim).
    """
    from financial_big_data_exp_4_spark.operators.dedup import (
        _cap_band_buckets,
    )

    band_w = LSH_PLANES // LSH_BANDS
    # fan the plane fold across cores before persisting (same
    # rationale as hyperplane_signatures; no-op at real split counts)
    sigs = _persist_scoped(
        _rebalance(embeddings, "vec_id").select(
            "vec_id",
            "embedding",
            norm(F.col("embedding")).alias("_norm"),
            F.expr(_LSH_SIG_EXPR).alias("sig"),
        )
    )
    bands = sigs.select(
        "vec_id",
        "embedding",
        "_norm",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.expr(
                            f"(sig >> {b * band_w}) & {(1 << band_w) - 1}"
                        ).alias("band_key"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("_b"),
    ).select("vec_id", "embedding", "_norm", "sig", "_b.band_id", "_b.band_key")
    bands = _cap_band_buckets(bands, max_bucket_size)
    a = bands.select(
        "band_id",
        "band_key",
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("_norm").alias("na"),
        F.col("sig").alias("sa"),
    )
    b = bands.select(
        F.col("band_id").alias("band_id_b"),
        F.col("band_key").alias("band_key_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("_norm").alias("nb"),
        F.col("sig").alias("sb"),
    )
    return (
        a.join(
            b,
            (F.col("band_id") == F.col("band_id_b"))
            & (F.col("band_key") == F.col("band_key_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select(
            "vec_a",
            "vec_b",
            F.expr("CAST(bit_count(sa ^ sb) AS BIGINT)").alias("hamming"),
            cosine_prenormed(
                F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
            ).alias("cos_sim"),
        )
        .distinct()
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    n_probes: int = 5,
    k: int = IVF_TOPK,
    stride: int | None = IVF_CENTROID_STRIDE,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed approximate top-k: assign every vector to its nearest
    centroid (map-side vs broadcast centroids), search only the probe's
    cell. nprobe=1 (single cell) — the standard IVF recall/cost knob.
    ``stride=None`` → ⌈√N⌉ (the corpus-scale path; see
    :func:`_sqrt_stride`); the declared query passes ``stride=None``
    and the oracle computes the same ⌈√N⌉ via a scalar subquery.

    Pass ``assigned`` (a materialized :func:`ivf_assignments` artifact)
    to serve from the prebuilt index: per-query cost is then the
    cell-local search (≈ √N per probe), not the N^1.5 index rebuild.

    Output: (probe_id, vec_id, cos_sim, rank) within the probe's cell.
    """
    # argmax via max(struct(cos, -cent_id)) inside _assign_cells:
    # partial-aggregates map-side (each partition reduces its N×C scored
    # rows to N before the shuffle, unlike a window over vec_id which
    # would shuffle all N×C rows). Struct order = max cos, tie → min id.
    # Persisted (scoped): probes and search targets both read the
    # assignment; see _persist_scoped for the eviction contract.
    if assigned is None:
        assigned = _persist_scoped(_assign_cells(embeddings, stride))
    probes = assigned.where(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        F.col("_norm").alias("_pnorm"),
        F.col("cell").alias("probe_cell"),
    )
    scored = (
        assigned.join(
            F.broadcast(probes), F.col("cell") == F.col("probe_cell")
        )
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            cosine_prenormed(
                F.col("probe_vec"),
                F.col("embedding"),
                F.col("_pnorm"),
                F.col("_norm"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("probe_id", "vec_id", "cos_sim", "rank")
    )


#: Learned-quantizer defaults: cell-count floor/cap and number of probed
#: cells. ``n_cells=None`` (the default) scales the cell count with the
#: corpus — ``clamp(⌈√n_distinct⌉, KMEANS_IVF_CELLS, KMEANS_IVF_CELLS_CAP)``
#: — because a FIXED cell count means per-cell occupancy (and so
#: per-probe search cost) grows linearly with the corpus (round-12
#: VERDICT watch item). √N cells is the standard IVF balance (cell size
#: ≈ √N); the cap bounds the k-means fit cost (O(N·k·iter) — at k=√N
#: the fit itself would go N^1.5; past the cap the right production
#: move is training on a sample, not a bigger k on the full corpus).
#: nprobe is the standard IVF recall/cost knob — searching the nprobe
#: nearest cells instead of one recovers neighbors the quantizer split
#: across a cell boundary at nprobe× the per-probe scan cost.
KMEANS_IVF_CELLS = 8
KMEANS_IVF_CELLS_CAP = 256
KMEANS_IVF_NPROBE = 2
#: Quantizer-training sample bound: above this many distinct vectors the
#: k-means fit trains on a ~this-sized uniform sample of the corpus
#: (assignment still covers every vector). At the cap of 256 cells this
#: keeps ≥ ~100 training points per centroid — the standard coarse-
#: quantizer regime — while keeping the fit O(1) in corpus size.
KMEANS_IVF_FIT_SAMPLE = 25_000


def cosine_topk_ivf_kmeans(
    embeddings: DataFrame,
    n_probes: int = 5,
    k: int = IVF_TOPK,
    n_cells: int | None = None,
    nprobe: int = KMEANS_IVF_NPROBE,
    seed: int = 42,
    max_iter: int = 8,
) -> DataFrame:
    """IVF approximate top-k with a LEARNED coarse quantizer: fit
    ``pyspark.ml.clustering.KMeans`` on the unit-normalized vectors
    (Euclidean on unit vectors is monotone in cosine, so the learned
    Voronoi cells are angular neighborhoods), assign map-side via
    ``model.transform`` (JVM-only, no crossJoin against centroids), then
    search the probe's ``nprobe`` nearest cells.

    The production sibling of :func:`cosine_topk_ivf` (whose systematic
    sampled "centroids" need no fit): the fit is a one-off model-build
    over the corpus — at scale you train on a sample and reuse the model
    across every query batch, which is exactly how the session-level
    memoization in the declared query treats it.

    Cell selection ranks centroids by the SAME metric the assignment
    minimizes (squared Euclidean to the unit probe:
    ``|c|^2 - 2 p·c`` up to a constant), and the probe's own ASSIGNED
    cell is additionally force-included in its probed set — the ranking
    recomputes distances in a different float-reduction order than
    ``model.transform``, so a tie exactly on the nprobe boundary could
    otherwise drop the home cell (round-8 ADVICE). Candidate
    scoring then uses the exact prenormed cosine on the ORIGINAL
    embeddings — identical expression to every other similarity path.

    Output: (probe_id, vec_id, cos_sim, rank, n_cand, n_home_cand) —
    rank 1..k, self excluded, ties broken by vec_id asc — plus ONE STUB
    row (NULL vec_id/cos_sim/rank, n_cand 0) for any indexable probe
    whose probed cells hold no candidates, so every indexable probe is
    represented in the output. ``n_cand`` is the number of candidates
    actually REACHABLE from the probe's ``nprobe`` probed cells (before
    the top-k cut) — the honest denominator for any "got k results"
    claim: with nprobe < n_cells the probed cells may legitimately hold
    fewer than k candidates even when the corpus has plenty (round-6
    ADVICE). ``n_home_cand`` is the occupancy of the probe's HOME cell
    minus the probe itself, computed from the assignment UPSTREAM of
    probe-cell selection and scoring — the falsifiable lower bound for
    the proof: the home cell is probed by construction, so
    ``n_cand ≥ n_home_cand`` must hold, and a broken cell ranking or
    scoring stage that silently empties the candidate set fails it
    (round-7 review: without this, the got-k claim compared the output
    only to its own byproducts and was true by construction). n_cand
    rides the rank window's own partition (no extra exchange); cell
    occupancy is one ≤ n_cells-row aggregate over the persisted
    assignment, broadcast onto the probes. Cell contents depend on the
    fitted centroids (float-reduction order), so the declared query
    exposes structural/bounds proofs rather than raw ids — see
    ``q_embed_ann_kmeans``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # persisted so the zero-norm filter below sits above a cache
    # boundary: predicate pushdown would otherwise substitute the norm
    # fold into the predicate and push it beneath the rebalance Exchange
    # onto the single-row-group scan task — the model-build actions
    # (distinct count, fit) would each pay a single-core norm pass (the
    # round-9 simhash finding, see minhash_candidate_pairs). The slot is
    # churn-safe: this whole build is memoized per (session, sf_dir) and
    # the FIFO eviction retires `base` before the assignment cache.
    base = _persist_scoped(
        _rebalance(embeddings, "vec_id").select(
            "vec_id", "embedding", norm(F.col("embedding")).alias("_norm")
        )
    )
    # zero-norm vectors have no direction, so they can live in no angular
    # cell: exclude them from the fit AND the index (array_to_vector
    # aborts on the NULL elements a tolerant divide would produce). Their
    # similarity to anything is NULL by the cosine contract anyway.
    unit = base.where(F.col("_norm") > 0).withColumn(
        "_feat",
        array_to_vector(
            F.transform(
                F.col("embedding"),
                lambda x: x.cast("double") / F.col("_norm"),
            )
        ),
    )
    # clamp k to the number of DISTINCT unit vectors: KMeans.fit aborts
    # outright when k exceeds the point count, and its k-means|| init
    # throws ArrayIndexOutOfBounds deeper in when duplicates leave fewer
    # distinct points than requested centers (a tiny or
    # duplicate-saturated corpus — colinear embeddings normalize to the
    # SAME unit vector). One cheap distinct-count action at MODEL-BUILD
    # time — the fit right after is already an action, and the declared
    # query memoizes the whole build per session. An empty index (every
    # vector zero-norm) short-circuits to an empty result with the
    # declared schema.
    n_distinct = unit.select("_feat").distinct().count()
    spark = embeddings.sparkSession
    if n_distinct == 0:
        return spark.createDataFrame(
            [],
            "probe_id long, vec_id long, cos_sim double, rank long, "
            "n_cand long, n_home_cand long",
        )
    if n_distinct < 2:
        # one distinct direction: a fit is both impossible (Spark KMeans
        # requires k ≥ 2) and pointless — everything lives in one cell.
        # The zero "centroid" only feeds the single-cell ranking, where
        # any value wins row_number 1.
        assigned = _persist_scoped(
            unit.select(
                "vec_id",
                "embedding",
                "_norm",
                F.lit(0).cast("long").alias("cell"),
            )
        )
        cents = spark.createDataFrame(
            [(0, [0.0])], "cell long, cvec array<double>"
        )
    else:
        if n_cells is None:
            # adaptive ⌈√N⌉ cells over the DISTINCT unit vectors (the
            # count the clamp action above already paid for), bounded
            # below by the teaching default and above by the fit-cost
            # cap — see the KMEANS_IVF_CELLS* docstring
            import math

            n_cells = max(
                KMEANS_IVF_CELLS,
                min(KMEANS_IVF_CELLS_CAP, math.isqrt(n_distinct - 1) + 1),
            )
        # Train the quantizer on a bounded sample when the corpus is
        # large: KMeans.fit is O(rows × k × maxIter), so adaptive cell
        # counts over a full big corpus would put an N·√N fit inside the
        # index build — exactly the cost class the adaptive cells exist
        # to avoid. Training a coarse quantizer on a subsample is the
        # standard production IVF recipe (the centroids only need to
        # approximate the density, and ~100 training points per centroid
        # is plenty); ASSIGNMENT still covers every vector via
        # model.transform. k is re-clamped to the SAMPLE's distinct
        # count (one more model-build-time action) because a
        # duplicate-saturated sample can hold fewer distinct points
        # than centers — the same k-means|| abort the outer clamp
        # guards against.
        fit_df = unit
        k_fit = min(n_cells, n_distinct)
        target = KMEANS_IVF_FIT_SAMPLE
        if n_distinct > target:
            n_unit = unit.count()
            fit_df = unit.sample(
                fraction=min(1.0, target / float(n_unit)), seed=seed
            )
            k_fit = min(
                k_fit, fit_df.select("_feat").distinct().count()
            )
            if k_fit < 2:  # pathological sample: fall back to full fit
                fit_df, k_fit = unit, min(n_cells, n_distinct)
        model = KMeans(
            k=k_fit,
            seed=seed,
            maxIter=max_iter,
            featuresCol="_feat",
            predictionCol="cell",
        ).fit(fit_df)
        assigned = _persist_scoped(
            model.transform(unit).select(
                "vec_id",
                "embedding",
                "_norm",
                F.col("cell").cast("long").alias("cell"),
            )
        )
        # centroid table: a model artifact of C×dim doubles —
        # driver-side by nature (like any fitted model), broadcast for
        # cell ranking
        cents = spark.createDataFrame(
            [
                (i, [float(x) for x in c])
                for i, c in enumerate(model.clusterCenters())
            ],
            "cell long, cvec array<double>",
        )
    # home-cell occupancy: ≤ n_cells rows, computed from the persisted
    # assignment BEFORE probe-cell selection — the proof's independent
    # lower bound (see docstring)
    cell_sizes = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("_cell_n")
    )
    probes = (
        assigned.where(F.col("vec_id") < n_probes)
        .join(F.broadcast(cell_sizes), "cell")
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("probe_vec"),
            F.col("_norm").alias("_pnorm"),
            F.col("cell").alias("_home_cell"),
            (F.col("_cell_n") - 1).cast("long").alias("_home_cand"),
        )
    )
    # assignment metric: |c|^2 - 2 (e/|e|)·c, smaller = closer
    cdist = dot(F.col("cvec"), F.col("cvec")) - 2.0 * dot(
        F.col("probe_vec"), F.col("cvec")
    ) / F.col("_pnorm")
    w_cells = Window.partitionBy("probe_id").orderBy(
        F.asc("_cdist"), F.asc("cell")
    )
    # The probe's ASSIGNED cell is force-included regardless of its
    # recomputed-distance rank: the ranking re-derives distances in a
    # different float-reduction order than model.transform, so at an
    # exact tie on the nprobe boundary the home cell could otherwise be
    # cut — which would falsify the n_cand ≥ n_home_cand contract the
    # docstring proves (round-8 ADVICE). Worst case this probes
    # nprobe+1 cells for a tied probe; recall only improves.
    probe_cells = (
        probes.crossJoin(F.broadcast(cents))
        .select(
            "probe_id",
            "probe_vec",
            "_pnorm",
            "cell",
            cdist.alias("_cdist"),
            (F.col("cell") == F.col("_home_cell")).alias("_is_home"),
        )
        .withColumn("_cr", F.row_number().over(w_cells))
        .where((F.col("_cr") <= nprobe) | F.col("_is_home"))
        .select("probe_id", "probe_vec", "_pnorm", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probe_cells), "cell")
        .where(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            cosine_prenormed(
                F.col("probe_vec"),
                F.col("embedding"),
                F.col("_pnorm"),
                F.col("_norm"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    w_cnt = Window.partitionBy("probe_id")
    ranked = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("n_cand", F.count(F.lit(1)).over(w_cnt).cast("long"))
        .where(F.col("rank") <= k)
    )
    # left join from the probe set: an indexable probe with an empty
    # candidate pool still emits one stub row (NULL vec_id/rank,
    # n_cand 0) carrying its independent home-cell bound
    return (
        probes.select("probe_id", "_home_cand")
        .join(ranked, "probe_id", "left")
        .select(
            "probe_id",
            "vec_id",
            "cos_sim",
            "rank",
            F.coalesce(F.col("n_cand"), F.lit(0)).cast("long").alias(
                "n_cand"
            ),
            F.col("_home_cand").alias("n_home_cand"),
        )
    )
