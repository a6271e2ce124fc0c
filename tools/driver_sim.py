"""Driver-simulation gate: the external correctness driver imports
``__spark_entry__`` with a PLAIN SparkSession (none of the engine's
session confs) and samples the first N ``queries()`` entries. The local
gate (`check_correctness.py`) runs under ``get_spark`` — green there
does not prove green under the driver's session. This tool reproduces
the driver's conditions: a bare builder session, default confs apart
from master/shuffle-partitions, then the same fingerprint compare.

Usage: python tools/driver_sim.py [sf_dir] [sample_n]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_correctness import (  # noqa: E402  (sibling tool module)
    register_views,
    table_fingerprint,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sample_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import duckdb
    from pyspark.sql import SparkSession

    # the driver's shape: plain session, no engine confs. Shuffle
    # partitions default to Spark's own 200 unless DRIVER_SIM_SHUFFLE is
    # set — results must be partition-count-invariant, so exercising a
    # different count than the local gate's 32 is part of the point.
    import os

    shuffle = os.environ.get("DRIVER_SIM_SHUFFLE")
    builder = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .appName("driver_sim")
    )
    if shuffle:
        builder = builder.config("spark.sql.shuffle.partitions", shuffle)
    # getOrCreate silently RETURNS a pre-existing session (e.g. one built
    # by get_spark with all engine confs), which would defeat the whole
    # point of simulating the driver's bare-session shape — refuse to run
    # under one rather than produce a false "green under plain confs"
    # (round-6 ADVICE). Check the PROCESS-global SparkContext, not just
    # getActiveSession(): the active session is thread-local, while
    # getOrCreate falls back to the process-wide instantiated session —
    # a session built on another thread (or after clearActiveSession)
    # would slip past an active-session-only check.
    from pyspark import SparkContext

    live_sc = SparkContext._active_spark_context
    if SparkSession.getActiveSession() is not None or live_sc is not None:
        name = live_sc.appName if live_sc is not None else "?"
        raise RuntimeError(
            "driver_sim must own its SparkSession; found a live "
            f"SparkContext/session ({name!r}) whose confs would leak "
            "into the simulation. Run driver_sim in a fresh process."
        )
    spark = builder.getOrCreate()

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    register_views(con, sf_dir)

    qs = list(entry_mod.queries().items())[:sample_n]
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs:
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            continue
        ok = table_fingerprint(scols, srows) == table_fingerprint(
            ocols, orows
        )
        print(("OK  " if ok else "FAIL") + f" {name}")
        if not ok:
            failures.append(name)
    print(
        f"\ndriver-sim: {len(failures)} failures: {failures}"
        if failures
        else "\ndriver-sim: all green"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
