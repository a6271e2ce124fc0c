"""ANN / LSH recall measurement (round-7 VERDICT #5, shipped round 9).

The ANN and candidate-generation operators carry structural proofs
(``has_k`` bounds, pigeonhole completeness for the radius they declare),
but none of that pins a NUMBER on what the approximate paths actually
recover. This tool measures it against two ground truths and writes a
committed artifact (``RECALL_r{N}.json``) whose floors
``tests/test_scale_gate.py`` (RECALL_FLOORS) re-asserts every round:

* **ANN recall@k vs exact brute force** — for the two top-k searches
  (``q_embed_ann_ivf``'s fit-free ⌈√N⌉-stride IVF and
  ``q_embed_ann_kmeans``'s learned-quantizer IVF), the metric is the
  mean over probes of |ANN top-k ∩ exact top-k| / |exact top-k| at
  k = ``IVF_TOPK`` — i.e. the fraction of the exact top-k set
  recovered, with the denominator clamped to the candidates that
  actually exist (|exact top-k| < k only when the table itself has
  fewer than k scorable vectors, in which case a perfect ANN should
  still read 1.0; round-9 ADVICE pinned this definition). The exact
  set comes from :func:`cosine_topk_bruteforce` (the same probes by
  construction: ``vec_id < n_probes``).

* **candidate-generation recall vs planted pairs** — ``generate_scaled``
  (tools/fuzz_correctness.py) plants known duplicate structure:
  embedding exact-dup pairs ``(2i+1, 2i+2)`` for ``i < nv/100`` and
  near-dup pairs ``(i+1, 2·(nv/100)+i+1)`` for ``i < nv/200`` (copy +
  1e-4 gaussian noise on 0.125-scale vectors → cosine ≈ 1); document
  exact-dup clusters of 4 (ids ``4c+1..4c+4`` for ``c < nd/50``) and
  one-token-edit near-dup pairs
  ``(4·n_clusters+i+1, 4·n_clusters+n_near+i+1)`` for ``i < nd/50``.
  Recall = fraction of those planted pairs present in the hyperplane-LSH
  candidate set (:func:`hyperplane_neardup_pairs`) and the MinHash band
  join (:func:`minhash_candidate_pairs`) respectively. Exact-dup pairs
  hash to identical signatures, so their recall is a correctness check
  (must be 1.0); near-dup recall is the honest probabilistic number the
  banding scheme actually delivers. Round 10 traced RECALL_r09's 0.42
  near-dup recall to the shift-fragile positional shingle stride (fixed:
  content-anchored selection, dedup.SHINGLE_SELECT_MOD), then moved the
  declared banding to 4 bands × 4 rows. The MinHash band join is
  measured under BOTH parameterizations — declared 4 × 4
  (P(candidate) = 1−(1−s⁴)⁴) and the legacy round-2..9 2 × 4
  (P = 1−(1−s⁴)²) — each with its candidate count and wall-clock, so
  the recall-vs-cost trade is IN the committed artifact, not prose
  (round-9 VERDICT #1).

Both scales (1× and 10× the sf0.1-shaped fixture) run in one session;
pair membership is checked with a semi-join against the planted-pair
list (a ≤ (nd/50)·6-row broadcast side), never a collect of the
candidate set.

Usage::

    python tools/recall_bench.py [--mult 10] [--seed 707] [--keep]
                                 [--out RECALL_r9.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ann_recall(spark, sf_dir: str) -> dict:
    """Fraction of the exact top-IVF_TOPK set recovered by each ANN path
    (denominator = |exact set|, clamped to available candidates — see
    module docstring), averaged over the shared probe set (vec_id < 5,
    the declared default)."""
    from pyspark.sql import functions as F

    from financial_big_data_exp_4_spark.operators.similarity import (
        IVF_TOPK,
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        cosine_topk_ivf_kmeans,
    )
    from financial_big_data_exp_4_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    k = IVF_TOPK

    def topset(df) -> dict[int, set[int]]:
        rows = (
            df.where(F.col("rank") <= k)
            .select("probe_id", "vec_id")
            .collect()
        )
        out: dict[int, set[int]] = {}
        for r in rows:
            out.setdefault(r.probe_id, set()).add(r.vec_id)
        return out

    exact = topset(cosine_topk_bruteforce(emb, k=k))
    out = {}
    for name, df in (
        ("ann_ivf", cosine_topk_ivf(emb, stride=None, k=k)),
        ("ann_kmeans", cosine_topk_ivf_kmeans(emb, k=k)),
    ):
        approx = topset(df.where(F.col("vec_id").isNotNull()))
        recalls = [
            len(approx.get(p, set()) & truth) / len(truth)
            for p, truth in exact.items()
            if truth
        ]
        out[f"{name}_recall_at_{k}"] = round(
            sum(recalls) / len(recalls), 4
        ) if recalls else None
    return out


def _pair_recall(spark, cand, expected: list[tuple[int, int]],
                 a_col: str, b_col: str) -> float | None:
    """Fraction of ``expected`` (a < b) pairs present in ``cand``."""
    from pyspark.sql import functions as F

    if not expected:
        return None
    exp = spark.createDataFrame(expected, f"{a_col} long, {b_col} long")
    hits = (
        exp.join(
            cand.select(a_col, b_col), [a_col, b_col], "semi"
        ).count()
    )
    return round(hits / len(expected), 4)


def _candidate_recall(spark, sf_dir: str, mult: int) -> dict:
    """Planted-pair recall of the hyperplane-LSH and MinHash candidate
    generators. Planted structure mirrors generate_scaled exactly."""
    from financial_big_data_exp_4_spark.operators.dedup import (
        minhash_candidate_pairs,
    )
    from financial_big_data_exp_4_spark.operators.similarity import (
        hyperplane_neardup_pairs,
    )
    from financial_big_data_exp_4_spark.sources.parquet import load_table

    nd = 5_000 * mult
    nv = 2_000 * mult

    # embeddings: exact pairs (2i+1, 2i+2); near pairs (i+1, 2*np+i+1)
    n_pairs = nv // 100
    emb_exact = [(2 * i + 1, 2 * i + 2) for i in range(n_pairs)]
    emb_near = [
        tuple(sorted((i + 1, 2 * n_pairs + i + 1)))
        for i in range(nv // 200)
    ]
    hyper = hyperplane_neardup_pairs(load_table(spark, sf_dir, "embeddings"))

    # documents: 6 pairs per exact cluster of 4; near pair per edit
    n_clusters = nd // 50
    doc_exact = [
        (4 * c + i + 1, 4 * c + j + 1)
        for c in range(n_clusters)
        for i in range(4)
        for j in range(i + 1, 4)
    ]
    n_near = nd // 50
    doc_near = [
        tuple(sorted((4 * n_clusters + i + 1,
                      4 * n_clusters + n_near + i + 1)))
        for i in range(n_near)
    ]
    docs = load_table(spark, sf_dir, "documents")

    # recall-vs-cost for BOTH minhash parameterizations: the declared
    # 4×4 setting and the legacy 2×4 one (constants kept addressable in
    # operators.dedup exactly for this measurement). Candidate count and
    # wall-clock are the cost axis; the count() also materializes the
    # candidate set once so the recall semi-joins below are warm.
    from financial_big_data_exp_4_spark.operators.dedup import (
        LEGACY_MINHASH_BANDS,
        LEGACY_MINHASH_COEFFS,
        LEGACY_MINHASH_ROWS_PER_BAND,
    )

    mh_cost = {}
    mh_frames = {}
    for tag, kwargs in (
        ("", {}),
        ("legacy_", {
            "coeffs": LEGACY_MINHASH_COEFFS,
            "n_bands": LEGACY_MINHASH_BANDS,
            "rows_per_band": LEGACY_MINHASH_ROWS_PER_BAND,
        }),
    ):
        t0 = time.perf_counter()
        frame = minhash_candidate_pairs(docs, **kwargs)
        n_cand = frame.count()
        mh_frames[tag] = frame
        mh_cost[f"minhash_{tag}candidates"] = n_cand
        mh_cost[f"minhash_{tag}pairs_sec"] = round(
            time.perf_counter() - t0, 1
        )
    mh, mh_legacy = mh_frames[""], mh_frames["legacy_"]

    return {
        "hyperplane_exact_pair_recall": _pair_recall(
            spark, hyper, emb_exact, "vec_a", "vec_b"
        ),
        "hyperplane_neardup_pair_recall": _pair_recall(
            spark, hyper, emb_near, "vec_a", "vec_b"
        ),
        "minhash_exact_pair_recall": _pair_recall(
            spark, mh, doc_exact, "doc_a", "doc_b"
        ),
        "minhash_neardup_pair_recall": _pair_recall(
            spark, mh, doc_near, "doc_a", "doc_b"
        ),
        "minhash_legacy_exact_pair_recall": _pair_recall(
            spark, mh_legacy, doc_exact, "doc_a", "doc_b"
        ),
        "minhash_legacy_neardup_pair_recall": _pair_recall(
            spark, mh_legacy, doc_near, "doc_a", "doc_b"
        ),
        **mh_cost,
        "n_planted": {
            "emb_exact": len(emb_exact),
            "emb_near": len(emb_near),
            "doc_exact": len(doc_exact),
            "doc_near": len(doc_near),
        },
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--seed", type=int, default=707)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # shared fixture-dir convention (path format + --keep reuse) lives in
    # scale_bench so both gates keep sharing the generated 10× data
    from scale_bench import _ensure_dir

    from financial_big_data_exp_4_spark.session import get_spark

    spark = get_spark("recall-bench")
    spark.range(1).count()

    per_scale = {}
    for mult in (1, args.mult):
        d = _ensure_dir(args.seed, mult, args.keep)
        t0 = time.perf_counter()
        per_scale[str(mult)] = {
            **_ann_recall(spark, d),
            **_candidate_recall(spark, d, mult),
            "elapsed_sec": None,
        }
        per_scale[str(mult)]["elapsed_sec"] = round(
            time.perf_counter() - t0, 1
        )

    payload = {"seed": args.seed, "mult": args.mult,
               "per_scale": per_scale}
    line = json.dumps(payload)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
