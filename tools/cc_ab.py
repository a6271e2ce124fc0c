"""Same-session A/B of seeded vs unseeded connected components.

Round-5 VERDICT #4: the historical "18.8s → ~0.6s" claim paired a
round-4 DuckDB-oracle number with a round-5 Spark number (the bench
artifact's truncation made the r4 Spark side unrecoverable). This tool
produces the honest pair: ONE session, ONE JVM, the SAME materialized
candidate-pair input, `connected_components(seeded=...)` toggled by the
one flag, interleaved passes, per-variant minimum reported.

Usage: python tools/cc_ab.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line: {"sf_dir":..., "seeded_sec":..., "unseeded_sec":...,
"speedup":..., "clusters":...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_big_data_exp_4_spark.operators.dedup import (  # noqa: E402
    minhash_candidate_pairs,
)
from financial_big_data_exp_4_spark.operators.graph import (  # noqa: E402
    connected_components,
)
from financial_big_data_exp_4_spark.plans.reference import load_table  # noqa: E402
from financial_big_data_exp_4_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("cc_ab")
    spark.range(1).count()

    # one shared input: materialized pairs, identical bytes for both arms
    pairs = minhash_candidate_pairs(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint(eager=True)

    def run(seeded: bool) -> float:
        t0 = time.perf_counter()
        connected_components(pairs, seeded=seeded).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    run(True)  # warmup: codegen for both plan shapes overlaps heavily
    run(False)
    best = {True: float("inf"), False: float("inf")}
    for _ in range(2):  # interleaved so a noise window can't favor an arm
        for arm in (True, False):
            best[arm] = min(best[arm], run(arm))

    n_clusters = (
        connected_components(pairs)
        .select("cluster_id")
        .distinct()
        .count()
    )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "seeded_sec": round(best[True], 3),
                "unseeded_sec": round(best[False], 3),
                "speedup": round(best[False] / best[True], 2),
                "clusters": n_clusters,
            }
        )
    )


if __name__ == "__main__":
    main()
