"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at a given sf dir on Spark, runs the matching
``oracle_sql()`` on DuckDB over the same parquet files, and compares
row count, column names, and an order-insensitive value hash (columns sorted
by name, rows sorted, values canonicalized). Exit 0 iff everything matches.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

#: Every fixture table the oracles may reference — single source of truth
#: shared by check_correctness, driver_sim, and type_audit.
BASE_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_views(con, sf_dir: str) -> None:
    """Register each fixture parquet as a DuckDB view named after it."""
    for t in BASE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, str, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), ",".join(sorted_cols), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import pyarrow as pa

    import __spark_entry__ as entry_mod
    from financial_big_data_exp_4_spark.session import get_spark

    spark = get_spark("check_correctness")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    register_views(con, sf_dir)

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            tbl = con.execute(oracles[name]).arrow()
            ocols = tbl.column_names
            cols_py = [c.to_pylist() for c in tbl.columns]
            orows = [tuple(vals) for vals in zip(*cols_py)] if cols_py else []
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            continue
        # DuckDB returns HUGEINT (arrow decimal128) for bare integer sum();
        # driver canonicalizers may render it differently from int64 even
        # when the digits agree, so an un-cast output type is itself a bug.
        unstable = [f.name for f in tbl.schema if pa.types.is_decimal(f.type)]
        if unstable:
            print(
                f"FAIL {name}: oracle output column(s) {unstable} are "
                f"DECIMAL/HUGEINT — wrap in CAST(... AS BIGINT/DOUBLE)"
            )
            failures.append(name)
            continue
        sn, sc, sh = table_fingerprint(scols, srows)
        on, oc, oh = table_fingerprint(ocols, orows)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "OK  " if ok else "FAIL"
        print(
            f"{status} {name}: rows {sn}/{on} cols [{sc}]/[{oc}] "
            f"hash {sh}/{oh} ({time.time()-t0:.1f}s)"
        )
        if not ok:
            failures.append(name)
            if sn == on and sc == oc:
                # show first differing rows for debugging
                sset = {tuple(map(canon, r)) for r in srows}
                oset = {tuple(map(canon, r)) for r in orows}
                for d in list(sset - oset)[:3]:
                    print(f"    spark-only: {d}")
                for d in list(oset - sset)[:3]:
                    print(f"    oracle-only: {d}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
