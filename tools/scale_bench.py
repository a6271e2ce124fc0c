"""Scale-trend bench: the same heavy-family queries timed at 1× and N×
an sf0.1-shaped synthetic fixture, in ONE session (round-6 VERDICT #3:
/root/testdata tops out at sf0.1, so every scale claim above that was a
design argument — this measures the slope).

Method matches bench.py: per (mult, query), one cold pass (first
execution — includes memo-family builds, codegen, footer cache) then
``PASSES`` timed passes through a noop sink, per-query minimum reported.
Both scales run in the same process/session back-to-back (bench host
memory: cross-session comparisons on this host are noise; A/B within one
session only). DuckDB oracles are NOT run — the cross-engine ratio lives
in bench.py; this tool answers one question: how does the SPARK side of
each heavy family scale with data volume?

Slope semantics: ``slope = warm(mult) / warm(1)`` against a data ratio
of ``mult``. slope ≈ mult → linear scaling; slope ≪ mult → fixed
per-job floor still dominates at this size; slope ≫ mult → super-linear
candidate growth (a real scale smell worth explaining or fixing).

Usage::

    python tools/scale_bench.py [--mult 10] [--seed 707]
                                [--out SCALE.json] [query ...]

Prints one JSON line with per-query cold/warm times at each scale and
the warm slopes; optionally writes it to ``--out``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PASSES = 2

#: The scale-relevant families: candidate-pair generation (minhash /
#: simhash / ngram / hyperplane / IVF-cell), graph iteration (connected
#: components, triangles), ANN search, decimal OLAP aggregates, skew
#: handling, and the heavier window/agg shapes. Streaming queries are
#: excluded on purpose — their cost is engine startup + state-store
#: commits (structural, paid once in production), so a data-volume slope
#: over them measures nothing.
HEAVY_QUERIES = [
    "q_neardup_minhash",
    "q_neardup_verified",
    "q_neardup_edit",
    "q_dedup_clusters",
    "q_dedup_incremental",
    "q_simhash_neardup",
    "q_ngram_jaccard",
    "q_embed_cosine_topk",
    "q_embed_ann_ivf",
    "q_embed_ann_kmeans",
    "q_embed_neardup",
    "q_semantic_dedup",
    "q_embed_lsh_pairs",
    "q_triangle_count",
    "q_lineitem_pricing",
    "q_shipping_priority",
    "q_skew_join",
    "q_skew_agg",
    "q_gap_fill",
    "q_sessionize",
    "q_running_total",
    "q_approx_percentile",
    "q_bm25",
    "q_tfidf",
]


def run_scale(spark, qs, names, sf_dir: str) -> dict[str, dict[str, float]]:
    out: dict[str, dict[str, float]] = {}

    def run_full(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        t0 = time.perf_counter()
        run_full(qs[name](spark, sf_dir))
        out[name] = {"cold": round(time.perf_counter() - t0, 3)}
    for _ in range(PASSES):
        for name in names:
            t0 = time.perf_counter()
            run_full(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            if "warm" not in out[name] or dt < out[name]["warm"]:
                out[name] = {**out[name], "warm": round(dt, 4)}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--seed", type=int, default=707)
    ap.add_argument("--out", default=None)
    ap.add_argument("--keep", action="store_true",
                    help="reuse existing generated dirs")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from fuzz_correctness import generate_scaled

    import __spark_entry__ as entry_mod
    from financial_big_data_exp_4_spark.session import get_spark

    names = args.queries or HEAVY_QUERIES
    qs = entry_mod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    dirs: dict[int, str] = {}
    for mult in (1, args.mult):
        d = f"/tmp/scale_sf_{args.seed}_x{mult}"
        if not (args.keep and os.path.isdir(d)):
            t0 = time.perf_counter()
            generate_scaled(d, args.seed, mult)
            print(f"generated {d} in {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
        dirs[mult] = d

    spark = get_spark("scale-bench")
    spark.range(1).count()

    results = {
        mult: run_scale(spark, qs, names, d) for mult, d in dirs.items()
    }
    slopes = {
        n: round(results[args.mult][n]["warm"] / results[1][n]["warm"], 2)
        if results[1][n]["warm"] > 0 else None
        for n in names
    }
    payload = {
        "mult": args.mult,
        "seed": args.seed,
        "per_scale": {str(m): r for m, r in results.items()},
        "warm_slope": slopes,
        "warm_total_1x": round(
            sum(r["warm"] for r in results[1].values()), 2
        ),
        f"warm_total_{args.mult}x": round(
            sum(r["warm"] for r in results[args.mult].values()), 2
        ),
    }
    line = json.dumps(payload)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
