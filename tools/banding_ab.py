"""Same-session A/B: declared 4×4 MinHash banding vs legacy 2×4, on the
PAIR-CONSUMER family (round-10 VERDICT watch item #1 / round-11
prescription #4).

Round 10 moved the declared banding from 2 bands × 4 rows (8 perms) to
4 × 4 (16 perms) to fix near-dup recall; the r10 bench then showed the
minhash-consumer warm costs rising (q_triangle_count 1.43 → 2.49 s,
q_dedup_clusters 1.75 s) while total Spark time stayed flat. The rise is
just above the host's ±25 % noise band, so cross-run comparison cannot
attribute it — this tool produces the honest number: ONE session, ONE
JVM, both banding parameterizations materialized to localCheckpoint
(identical consumer-input discipline, the tools/cc_ab.py pattern),
consumers timed interleaved, per-arm minimum over 2 passes.

Consumers measured per arm:
  * triangle_count over the candidate graph (q_triangle_count's core)
  * dedup_clusters i.e. connected components (q_dedup_clusters' core)

q_semantic_dedup is timed once per scale as a CONTROL: it consumes
embedding IVF-cell pairs, not minhash pairs, so banding cannot affect
it — if its warm time also moved between rounds, that movement is host
noise by construction.

Usage::

    python tools/banding_ab.py [sf_dir ...]
        (default: /root/testdata/sf0.1 and /tmp/scale_sf_707_x10)

Prints one JSON line per sf_dir plus a combined line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_big_data_exp_4_spark.operators.dedup import (  # noqa: E402
    LEGACY_MINHASH_BANDS,
    LEGACY_MINHASH_COEFFS,
    LEGACY_MINHASH_ROWS_PER_BAND,
    minhash_candidate_pairs,
)
from financial_big_data_exp_4_spark.operators.graph import (  # noqa: E402
    connected_components,
    triangle_count,
)
from financial_big_data_exp_4_spark.session import get_spark  # noqa: E402
from financial_big_data_exp_4_spark.sources.parquet import (  # noqa: E402
    load_table,
)


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def measure(spark, sf_dir: str, passes: int = 2) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    arms = {
        "declared_4x4": minhash_candidate_pairs(docs),
        "legacy_2x4": minhash_candidate_pairs(
            docs,
            coeffs=LEGACY_MINHASH_COEFFS,
            n_bands=LEGACY_MINHASH_BANDS,
            rows_per_band=LEGACY_MINHASH_ROWS_PER_BAND,
        ),
    }
    # identical input discipline: both candidate sets materialized before
    # any consumer timing, so the signature/banding cost is OUT of the
    # consumer numbers (the watch item is about the CONSUMERS getting
    # costlier on the wider band output, not the generator itself)
    pairs = {
        arm: df.localCheckpoint(eager=True) for arm, df in arms.items()
    }
    consumers = {
        "triangle_count": lambda p: triangle_count(
            p, src="doc_a", dst="doc_b"
        ),
        "dedup_clusters_cc": lambda p: connected_components(p),
    }

    out: dict = {
        "sf_dir": sf_dir,
        "n_pairs": {arm: p.count() for arm, p in pairs.items()},
    }
    best: dict[tuple[str, str], float] = {}
    # one untimed warmup per (consumer, arm) plan shape, then interleave
    for cname, build in consumers.items():
        for arm, p in pairs.items():
            _noop_write(build(p))
    for _ in range(passes):
        for cname, build in consumers.items():
            for arm, p in pairs.items():
                t0 = time.perf_counter()
                _noop_write(build(p))
                dt = time.perf_counter() - t0
                k = (cname, arm)
                best[k] = min(best.get(k, float("inf")), dt)
    for (cname, arm), dt in best.items():
        out[f"{cname}__{arm}_sec"] = round(dt, 3)

    # banding-independent control (embedding pairs, shares nothing with
    # the minhash stage) — warm min of `passes`
    from financial_big_data_exp_4_spark.plans.extensions import (
        q_semantic_dedup,
    )

    ctrl = float("inf")
    _noop_write(q_semantic_dedup(spark, sf_dir))
    for _ in range(passes):
        t0 = time.perf_counter()
        _noop_write(q_semantic_dedup(spark, sf_dir))
        ctrl = min(ctrl, time.perf_counter() - t0)
    out["control_semantic_dedup_sec"] = round(ctrl, 3)
    return out


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/scale_sf_707_x10",
    ]
    spark = get_spark("banding_ab")
    spark.range(1).count()
    results = []
    for d in dirs:
        if not os.path.isdir(d) and not os.path.isdir(
            os.path.dirname(d)
        ):
            print(f"skip missing {d}", file=sys.stderr)
            continue
        results.append(measure(spark, d))
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"banding_ab": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
