"""Scale-trend bench and slope-budget GATE: the same heavy-family
queries timed at 1× and N× an sf0.1-shaped synthetic fixture, in ONE
session (round-6 VERDICT #3: /root/testdata tops out at sf0.1, so every
scale claim above that was a design argument — this measures the slope).

Round-9 upgrade (round-7 VERDICT #3, re-prescribed r8/r9): the one-shot
measurement is now a repeatable per-round gate. The four operator-family
lists that used to live only in the r07 artifacts are first-class here
(``FAMILIES``), each with its own scale multiplier; ``--families all``
runs every list in one session and writes ONE merged artifact
(``SCALE_r{N}.json``); ``--assert-budgets`` FAILS (exit 1) when any
warm slope exceeds its budget — so a reintroduced quadratic (like the
round-7 constant-stride IVF or 8-bit hyperplane bands, both caught by
this tool's one-shot ancestor) trips a red gate instead of shipping
silently.

Method matches bench.py: per (mult, query), one cold pass (first
execution — includes memo-family builds, codegen, footer cache) then
``--passes`` timed passes through a noop sink, per-query minimum
reported. All scales run in the same process/session back-to-back
(bench host memory: cross-session comparisons on this host are noise;
A/B within one session only). DuckDB oracles are NOT run — the
cross-engine ratio lives in bench.py; this tool answers one question:
how does the SPARK side of each heavy family scale with data volume?

Slope semantics: ``slope = warm(mult) / warm(1)`` against a data ratio
of ``mult``. slope ≈ mult → linear scaling; slope ≪ mult → fixed
per-job floor still dominates at this size; slope ≫ mult → super-linear
candidate growth (a real scale smell worth explaining or fixing).

Budget semantics: a query's slope budget is ``mult × BUDGET_FACTOR``
unless ``SLOPE_BUDGETS`` documents a tighter/looser per-query bound.
The budget is a REGRESSION TRIPWIRE pinned above the measured healthy
slopes (every committed family measures at or below the data ratio at
these fixture sizes — even the N^1.5-by-design IVF paths, whose
constants keep them under mult here), not an asymptotic claim.

Usage::

    python tools/scale_bench.py --families all --assert-budgets \
        --out SCALE_r9.json                      # the per-round gate
    python tools/scale_bench.py [--mult 10] [--seed 707] [query ...]
                                                 # ad-hoc single list
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Hold the EXECUTION REGIME constant across the slope ratio: the session
# normally runs sub-64 MB inputs with AQE off (the tiny-input scheduler-
# floor optimization), but this gate's 1x fixture is 17.5 MB while the
# 10x/100x fixtures are above the threshold — letting the regime flip
# inside the warm(Nx)/warm(1x) ratio speeds up only the DENOMINATOR and
# inflates every slope (round 13: q_inverted_index 7.2 → 13.3 "slope"
# with the 10x absolute flat — a pure regime artifact that tripped the
# budget). Slopes here measure data-growth behavior of the scale-path
# plans, so both sides run the scale regime (AQE on). Must be set before
# the package import below reads it.
os.environ.setdefault("SPARK_GRAFT_AQE_OFF_BYTES", "0")

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

#: Warehouse/window family (the r07 SCALEWH list): MERGE/SCD2/diff are
#: broadcast-change-set shapes, the rest are window/percentile shapes.
WAREHOUSE_QUERIES = [
    "q_asof_join",
    "q_merge_upsert",
    "q_scd2",
    "q_table_diff",
    "q_window_rank",
    "q_winsorize",
    "q_dedup_latest",
    "q_correlation",
    "q_rollup",
    "q_range_join",
    # the profile pair: exact (declared, one Expand = |cols|× row
    # blow-up through the aggregate) next to the HLL++ approx knob the
    # 100 TB mode uses (no Expand, partial-aggregable) — the gate
    # records both slopes so the sub-Expand claim is measured, not
    # asserted (round-12 VERDICT #7)
    "q_profile",
    "q_profile_approx",
]

#: Corpus-curation/text family (the r07 SCALECORPUS list): map-only
#: regex/tokenize shapes plus the bounded-postings index builders.
CORPUS_QUERIES = [
    "q_inverted_index",
    "q_seq_pack",
    "q_stratified_sample",
    "q_quality_filter",
    "q_doc_chunks",
    "q_pii_scrub",
    "q_hash_sample",
    "q_doc_fingerprint",
    # bloom build is one explode(k)+groupBy pass (linear); membership is
    # a broadcast word join — the slope should track the corpus ratio
    "q_bloom_prefilter",
]

#: The 100× "second decade" list: the candidate-generation shapes whose
#: bucket/band mechanisms can flip from linear to quadratic only past a
#: corpus-size threshold (the r07 hyperplane bug appeared exactly here).
#: Round-9 (r08 VERDICT #2): q_simhash_neardup and q_neardup_edit join
#: the list — simhash's 4×13-bit band join is the one family whose slope
#: tracked the data ratio at 10×/30×, with the same linear-buckets →
#: quadratic-join onset mechanism as the fixed hyperplane bug, expected
#: near the 100× fixture's 500k docs; q_neardup_edit rides the same
#: candidate set through the capped-Levenshtein verify.
WIDE_QUERIES = [
    "q_neardup_minhash",
    "q_simhash_neardup",
    "q_simhash_neardup_capped",
    "q_neardup_edit",
    "q_dedup_clusters",
    "q_triangle_count",
    "q_embed_ann_ivf",
    "q_embed_ann_kmeans",
    "q_embed_lsh_pairs",
    "q_lineitem_pricing",
    "q_bm25",
    "q_gap_fill",
    # round-14 (r13 VERDICT #7): the REST of the dedup/CC/minhash
    # centerpiece now gets the same 100× evidence as the band joins —
    # exact-hash dedup, the verify pass over the memoized candidates,
    # the incremental signed-corpus path, and the embedding-space
    # near-dup/semantic-dedup pair (both serve the memoized √N-cell IVF
    # artifact, so their WARM slope measures candidate growth, not the
    # N^1.5 index build the cold column prices).
    "q_dedup_exact",
    "q_neardup_verified",
    "q_dedup_incremental",
    "q_embed_neardup",
    "q_semantic_dedup",
]

#: family name -> (scale multiplier, query list). ``--families all``
#: runs every entry in one session; 1×/10×/100× fixture dirs are shared
#: across families.
FAMILIES: dict[str, tuple[int, list[str]]] = {
    "heavy": (10, HEAVY_QUERIES),
    "warehouse": (10, WAREHOUSE_QUERIES),
    "corpus": (10, CORPUS_QUERIES),
    "wide": (100, WIDE_QUERIES),
}

#: Slope budget = mult × this factor unless overridden below. 1.2 keeps
#: headroom for host noise on a warm in-session A/B while still firing
#: well before quadratic growth (a quadratic shows slope ≈ mult² long
#: before any fixture limit).
BUDGET_FACTOR = 1.2

#: Documented per-query budget EXPONENTS: {query: e} → that query's
#: budget is ``mult**e × BUDGET_FACTOR`` instead of the default linear
#: ``e = 1``. Exactly one entry today: q_embed_ann_ivf is the fit-free
#: ⌈√N⌉-stride IVF whose assignment + in-cell search is N^1.5 BY DESIGN
#: (√N centroids — see operators/similarity.py:_sqrt_stride; its linear
#: production sibling q_embed_ann_kmeans keeps the default budget and
#: measured slope 4.8 at 100×). Measured 131 at 100× in round 9 against
#: the theoretical 100^1.5 = 1000 — the default linear budget of 120
#: fires on the design itself, not on a regression. An exponent keeps
#: the budget meaningful at BOTH multipliers the query is measured at
#: (10× → 38, 100× → 1200), where one absolute cap could not.
SLOPE_BUDGETS: dict[str, float] = {"q_embed_ann_ivf": 1.5}

#: The bucket cap the WIDE run applies to its simhash capped-path row.
#: ``max_bucket_size=None`` is the declared exact form, but a
#: boilerplate-heavy real corpus hits degenerate band buckets even at
#: 26-bit keys, and the production guidance is to run capped (round-9
#: VERDICT #6). The gate therefore exercises the capped plan every
#: round as a BENCH-ONLY query (never declared — the declared oracle
#: semantics stay closed-form), so a regression in the cap's
#: window-count path shows up as a slope violation here rather than in
#: production.
SIMHASH_SCALE_BUCKET_CAP = 10_000


def _bench_only_queries() -> dict:
    """Bench-only query callables merged over the declared registry for
    the scale gate (names must NOT collide with declared queries)."""
    def q_simhash_neardup_capped(spark, sf_dir):
        from financial_big_data_exp_4_spark.operators.dedup import (
            simhash_neardup_pairs,
        )
        from financial_big_data_exp_4_spark.sources.parquet import (
            load_table,
        )

        return simhash_neardup_pairs(
            load_table(spark, sf_dir, "documents"),
            max_bucket_size=SIMHASH_SCALE_BUCKET_CAP,
        )

    def q_profile_approx(spark, sf_dir):
        from financial_big_data_exp_4_spark.operators.relational import (
            profile_columns,
        )
        from financial_big_data_exp_4_spark.sources.parquet import (
            load_table,
        )

        return profile_columns(
            load_table(spark, sf_dir, "orders"),
            cols=(
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_orderpriority",
            ),
            approx=True,
        )

    return {
        "q_simhash_neardup_capped": q_simhash_neardup_capped,
        "q_profile_approx": q_profile_approx,
    }


def slope_budget(query: str, mult: int) -> float:
    return mult ** SLOPE_BUDGETS.get(query, 1.0) * BUDGET_FACTOR


def budget_violations(
    families: dict[str, dict], factor: float = BUDGET_FACTOR
) -> list[dict]:
    """Slope-budget violations in an artifact's ``families`` payload.

    Shared with ``tests/test_scale_gate.py`` so the committed artifact
    is re-checked by pytest every round with the same arithmetic."""
    out = []
    for fam, fdata in families.items():
        mult = fdata["mult"]
        for q, slope in fdata["warm_slope"].items():
            if slope is None:
                continue
            cap = mult ** SLOPE_BUDGETS.get(q, 1.0) * factor
            if slope > cap:
                out.append(
                    {"family": fam, "query": q, "mult": mult,
                     "slope": slope, "budget": cap}
                )
    return out


def run_scale(
    spark, qs, names, sf_dir: str, passes: int = PASSES
) -> dict[str, dict[str, float]]:
    out: dict[str, dict[str, float]] = {}

    def run_full(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        t0 = time.perf_counter()
        run_full(qs[name](spark, sf_dir))
        out[name] = {"cold": round(time.perf_counter() - t0, 3)}
    for _ in range(passes):
        for name in names:
            t0 = time.perf_counter()
            run_full(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            if "warm" not in out[name] or dt < out[name]["warm"]:
                out[name] = {**out[name], "warm": round(dt, 4)}
    return out


def _ensure_dir(seed: int, mult: int, keep: bool) -> str:
    from fuzz_correctness import generate_scaled

    d = f"/tmp/scale_sf_{seed}_x{mult}"
    if not (keep and os.path.isdir(d)):
        t0 = time.perf_counter()
        generate_scaled(d, seed, mult)
        print(f"generated {d} in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    return d


def _measure_family(
    spark, qs, names, mult, dirs, seed, keep, passes
) -> dict:
    """1× vs mult× for one query list; fixture dirs are cached across
    families in ``dirs``."""
    results = {}
    for m in (1, mult):
        if m not in dirs:
            dirs[m] = _ensure_dir(seed, m, keep)
        results[m] = run_scale(spark, qs, names, dirs[m], passes)
    slopes = {
        n: round(results[mult][n]["warm"] / results[1][n]["warm"], 2)
        if results[1][n]["warm"] > 0 else None
        for n in names
    }
    return {
        "mult": mult,
        "per_scale": {str(m): r for m, r in results.items()},
        "warm_slope": slopes,
        "warm_total_1x": round(
            sum(r["warm"] for r in results[1].values()), 2
        ),
        f"warm_total_{mult}x": round(
            sum(r["warm"] for r in results[mult].values()), 2
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--seed", type=int, default=707)
    ap.add_argument("--out", default=None)
    ap.add_argument("--keep", action="store_true",
                    help="reuse existing generated dirs")
    ap.add_argument("--passes", type=int, default=PASSES,
                    help="warm passes per (scale, query)")
    ap.add_argument("--families", default=None,
                    help="comma-separated family names or 'all'; each "
                         "family runs at its own multiplier and the "
                         "artifact merges them all")
    ap.add_argument("--assert-budgets", action="store_true",
                    help="exit 1 if any warm slope exceeds its budget")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from financial_big_data_exp_4_spark.session import get_spark

    declared = entry_mod.queries()
    bench_only = _bench_only_queries()
    # bench-only entries must never SHADOW a declared query: if a name
    # is ever promoted to the declared registry, the gate must measure
    # the declared plan, not silently keep timing the bench-only twin
    collision = set(bench_only) & set(declared)
    assert not collision, f"bench-only names shadow declared: {collision}"
    qs = {**declared, **bench_only}

    if args.families:
        fam_names = (
            list(FAMILIES) if args.families == "all"
            else [f.strip() for f in args.families.split(",") if f.strip()]
        )
        unknown = [f for f in fam_names if f not in FAMILIES]
        if unknown:
            raise SystemExit(f"unknown families: {unknown}")
        if args.queries:
            raise SystemExit("--families and positional queries are "
                             "mutually exclusive")
        plan = {f: FAMILIES[f] for f in fam_names}
    else:
        plan = {"adhoc": (args.mult, args.queries or HEAVY_QUERIES)}

    for _, (_, names) in plan.items():
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("scale-bench")
    spark.range(1).count()

    dirs: dict[int, str] = {}
    families_out = {}
    for fam, (mult, names) in plan.items():
        t0 = time.perf_counter()
        families_out[fam] = _measure_family(
            spark, qs, names, mult, dirs, args.seed, args.keep,
            args.passes,
        )
        print(f"family {fam} (x{mult}, {len(names)} queries) done in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    violations = budget_violations(families_out)
    payload: dict = {
        "seed": args.seed,
        "passes": args.passes,
        "budget_factor": BUDGET_FACTOR,
        "families": families_out,
        "violations": violations,
    }
    if list(plan) == ["adhoc"]:
        # keep the old flat shape for ad-hoc runs (and the r07 artifacts'
        # readers): single list, single mult
        payload.update(families_out["adhoc"])
    line = json.dumps(payload)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    if args.assert_budgets and violations:
        print(f"SLOPE BUDGET EXCEEDED: {json.dumps(violations)}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
