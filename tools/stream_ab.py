"""A/B the streaming drains' state-store provider: HDFS-backed in-memory
(default) vs RocksDB, same session, same fixture (round-12 VERDICT #3).

Method: for each provider, run every q_stream_* declared query through
its normal ``_drain_stream`` path (checkpoint on /dev/shm, availableNow,
memory sink) — one untimed warmup per provider absorbs engine startup,
then ``--passes`` timed drains; per-query minimum reported, plus a
row-count cross-check between providers (the provider must never change
results, only where state lives).

Also sweeps the drain's state-partition count (``--partitions 2 4 8``)
per provider: the declared default (4) is the measured sf0.1 knee, but
per-partition commit overhead vs state-volume parallelism trades
differently at bigger fixtures.

Usage:
    python tools/stream_ab.py [sf_dir] [--passes 2] [--partitions 4 ...]

Prints one JSON line:
    {"sf_dir": ..., "queries": {q: {"default@4": s, "rocksdb@4": s,
     "rows": n}}, "totals": {"default@4": s, ...}}
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
    ap.add_argument("--partitions", type=int, nargs="*", default=[4])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from financial_big_data_exp_4_spark.plans import REFERENCE_QUERIES
    from financial_big_data_exp_4_spark.session import get_spark

    spark = get_spark("stream_ab")
    out: dict = {"sf_dir": args.sf_dir, "queries": {}, "totals": {}}
    rows_by_variant: dict[str, dict[str, int]] = {}
    variants = [
        (prov, parts)
        for prov in ("default", "rocksdb")
        for parts in args.partitions
    ]
    for provider, parts in variants:
        key = f"{provider}@{parts}"
        os.environ["SPARK_GRAFT_STATE_PROVIDER"] = provider
        os.environ["SPARK_GRAFT_DRAIN_PARTITIONS"] = str(parts)
        rows_by_variant[key] = {}
        total = 0.0
        for q in STREAM_QUERIES:
            fn = REFERENCE_QUERIES[q]
            # warmup: engine startup, codegen, parquet footers
            rows_by_variant[key][q] = fn(spark, args.sf_dir).count()
            best = float("inf")
            for _ in range(args.passes):
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            out["queries"].setdefault(q, {})[key] = round(best, 4)
            total += best
        out["totals"][key] = round(total, 4)
    os.environ.pop("SPARK_GRAFT_STATE_PROVIDER", None)
    os.environ.pop("SPARK_GRAFT_DRAIN_PARTITIONS", None)
    base = rows_by_variant[f"default@{args.partitions[0]}"]
    mismatches = {
        f"{q}:{key}": (base[q], rows_by_variant[key][q])
        for key in rows_by_variant
        for q in STREAM_QUERIES
        if rows_by_variant[key][q] != base[q]
    }
    for q in STREAM_QUERIES:
        out["queries"][q]["rows"] = base[q]
    out["row_mismatches"] = mismatches
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 1 if mismatches else 0


if __name__ == "__main__":
    raise SystemExit(main())
