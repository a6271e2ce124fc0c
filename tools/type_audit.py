"""Cross-engine output-TYPE audit.

The correctness gate hashes canonicalized VALUES, so a Spark DECIMAL(38,0)
and a DuckDB BIGINT both rendering "42" pass locally — but an external
canonicalizer that renders by type (the q_feature_pipeline HUGEINT lesson,
round 4-5) can hash them differently. This tool compares the Spark result
schema against the DuckDB oracle's Arrow schema for every declared query
and fails on risky pairings:

* any DECIMAL on either side (both engines should cast aggregates to
  BIGINT/DOUBLE explicitly);
* integer-family vs float-family mismatches;
* timestamp/date vs string/number mismatches.

Same-family width differences (int vs bigint, float vs double) are
accepted: canonicalizers treat widths alike.

Usage: python tools/type_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def family(t: str) -> str:
    t = t.lower()
    # container kinds first: "array<bigint>" must NOT classify as "int"
    # (a list-vs-scalar mismatch is exactly what this tool exists to
    # catch). Spark spells arrays "array<...>"; Arrow spells them
    # "list<item: ...>" / "large_list<...>"; both sides keep the element
    # family so array<bigint> vs list<item: double> still differs.
    for kind, spark_prefix, arrow_prefixes in (
        ("array", "array<", ("list<", "large_list<", "fixed_size_list")),
        ("map", "map<", ("map<",)),
        ("struct", "struct<", ("struct<",)),
    ):
        if t.startswith(spark_prefix) or t.startswith(arrow_prefixes):
            inner = t.split("<", 1)[1].rsplit(">", 1)[0]
            inner = inner.split(":", 1)[-1].strip()  # arrow "item: type"
            return f"{kind}<{family(inner)}>"
    if "decimal" in t or "hugeint" in t:
        return "DECIMAL"
    if any(k in t for k in ("int", "long", "short", "byte")):
        return "int"
    if any(k in t for k in ("float", "double", "halffloat")):
        return "float"
    if "bool" in t:
        return "bool"
    if any(k in t for k in ("timestamp", "date", "time")):
        return "time"
    if any(k in t for k in ("string", "varchar", "utf8", "large_string")):
        return "str"
    return t


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import register_views

    import __spark_entry__ as entry_mod
    from financial_big_data_exp_4_spark.session import get_spark

    spark = get_spark("type_audit")
    con = duckdb.connect()
    register_views(con, sf_dir)

    failures = []
    oracles = entry_mod.oracle_sql()
    for name, fn in entry_mod.queries().items():
        if name not in oracles:
            continue
        try:
            sdtypes = dict(fn(spark, sf_dir).dtypes)
        except Exception as e:  # surface, don't hide
            failures.append((name, f"spark schema error: {e}"))
            continue
        try:
            # LIMIT 0 wrapper: type inference without executing the body
            # where possible (DuckDB still plans the full query).
            tbl = con.execute(
                f"SELECT * FROM ({oracles[name]}) LIMIT 0"
            ).arrow()
        except Exception as e:
            failures.append((name, f"oracle schema error: {e}"))
            continue
        otypes = {f.name: str(f.type) for f in tbl.schema}
        for col in otypes.keys() - sdtypes.keys():
            failures.append((name, f"oracle-only column {col}"))
        for col, st in sdtypes.items():
            if col not in otypes:
                failures.append((name, f"column {col} missing in oracle"))
                continue
            sf_, of_ = family(st), family(otypes[col])
            if sf_ != of_ or "DECIMAL" in sf_ or "DECIMAL" in of_:
                failures.append(
                    (name, f"{col}: spark {st} vs oracle {otypes[col]}")
                )

    for name, msg in failures:
        print(f"TYPE-FAIL {name}: {msg}")
    print(f"type audit: {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
