"""A/B the streaming drains' state-store provider: HDFS-backed in-memory
(default) vs RocksDB, same session, same fixture (round-12 VERDICT #3).

Method: for each provider, run every q_stream_* declared query through
its normal ``_drain_stream`` path (checkpoint on /dev/shm, availableNow,
memory sink) — one untimed warmup per provider absorbs engine startup,
then ``--passes`` timed drains; per-query minimum reported, plus a
row-count cross-check between providers (the provider must never change
results, only where state lives).

Usage:
    python tools/stream_ab.py [sf_dir] [--passes 2]

Prints one JSON line:
    {"sf_dir": ..., "queries": {q: {"default": s, "rocksdb": s, "rows": n}},
     "totals": {"default": s, "rocksdb": s}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STREAM_QUERIES = [
    "q_stream_tumbling",
    "q_stream_sessions",
    "q_stream_dedup",
    "q_stream_range_join",
    "q_stream_stateful",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from financial_big_data_exp_4_spark.plans import REFERENCE_QUERIES
    from financial_big_data_exp_4_spark.session import get_spark

    spark = get_spark("stream_ab")
    out: dict = {"sf_dir": args.sf_dir, "queries": {}, "totals": {}}
    rows_by_provider: dict[str, dict[str, int]] = {}
    for provider in ("default", "rocksdb"):
        os.environ["SPARK_GRAFT_STATE_PROVIDER"] = provider
        rows_by_provider[provider] = {}
        total = 0.0
        for q in STREAM_QUERIES:
            fn = REFERENCE_QUERIES[q]
            # warmup: engine startup, codegen, parquet footers
            rows_by_provider[provider][q] = fn(spark, args.sf_dir).count()
            best = float("inf")
            for _ in range(args.passes):
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            out["queries"].setdefault(q, {})[provider] = round(best, 4)
            total += best
        out["totals"][provider] = round(total, 4)
    os.environ.pop("SPARK_GRAFT_STATE_PROVIDER", None)
    mismatches = {
        q: (rows_by_provider["default"][q], rows_by_provider["rocksdb"][q])
        for q in STREAM_QUERIES
        if rows_by_provider["default"][q] != rows_by_provider["rocksdb"][q]
    }
    for q in STREAM_QUERIES:
        out["queries"][q]["rows"] = rows_by_provider["default"][q]
    out["row_mismatches"] = mismatches
    print(json.dumps(out))
    return 1 if mismatches else 0


if __name__ == "__main__":
    raise SystemExit(main())
