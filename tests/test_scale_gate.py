"""Artifact gates for the scale-slope and recall measurements.

The measurements themselves are too heavy for pytest (minutes of fixture
generation + Spark time at 10×/100× data), so the per-round runners
(``tools/scale_bench.py --families all --assert-budgets`` and
``tools/recall_bench.py``) write committed artifacts and THESE tests
hold the committed numbers to their budgets/floors. The contract:

* a reintroduced quadratic shows up as a budget violation the next time
  the runner executes — and the runner's artifact is committed, so the
  violation is also red HERE for every round after, until fixed;
* the artifact cannot silently go stale: the newest committed scale
  artifact must cover every query in every family list (so adding a
  heavy query without measuring it is loud), and floors are asserted on
  the newest artifact only.

Round-1-style skip semantics: no new-format artifact yet → skip (the
r07 artifacts predate the family format and are historical records,
not gates).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT / "tools"))

from scale_bench import (  # noqa: E402
    FAMILIES,
    budget_violations,
)

#: Recall floors asserted on the newest committed RECALL_r{N}.json.
#: Exact-dup pairs hash to identical signatures/cells, so their recall
#: is a correctness property (1.0, no slack). Near-dup and ANN floors
#: are pinned ~0.05 under the measured round-9 values — they fire on a
#: mechanism change (fewer bands, broken verify prune, quantizer
#: regression), not on host noise (recall is deterministic given the
#: fixture seed; the slack covers fixture regeneration drift only).
RECALL_FLOORS = {
    # both ANN paths measured 1.0 at 1x and 10x (round 9)
    "ann_ivf_recall_at_3": 0.90,
    "ann_kmeans_recall_at_3": 0.90,
    "hyperplane_exact_pair_recall": 1.0,
    "hyperplane_neardup_pair_recall": 0.95,
    "minhash_exact_pair_recall": 1.0,
    # round 10 fixed the shift-fragile positional shingle stride (the
    # REAL cause of r9's 0.42 — see dedup.SHINGLE_SELECT_MOD) and moved
    # the declared banding to 4 bands x 4 rows: planted-pair Jaccard is
    # back at 0.63-0.97 and P(candidate) = 1-(1-s^4)^4 ≥ 0.94 there,
    # while background pairs (s ≈ 0.01-0.04) stay suppressed by s^4 so
    # candidate volume remains linear in N
    "minhash_neardup_pair_recall": 0.90,
    # (the legacy 2x4 arm was retired in round 14 — r13 VERDICT #8 —
    # after RECALL_r13 recorded its final A/B: 0.885 vs 0.961 at 10x;
    # artifacts from r13 and earlier still carry its keys, which this
    # floor table simply no longer asserts)
}


def _newest(pattern: str) -> tuple[str, dict] | None:
    best: tuple[int, Path] | None = None
    for p in REPO_ROOT.glob(pattern.replace("{N}", "*")):
        m = re.fullmatch(pattern.replace("{N}", r"(\d+)"), p.name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    if best is None:
        return None
    return best[1].name, json.load(best[1].open())


def test_scale_artifact_within_budgets() -> None:
    found = _newest("SCALE_r{N}.json")
    if found is None or "families" not in found[1]:
        pytest.skip("no family-format SCALE_r{N}.json committed yet")
    name, art = found
    viols = budget_violations(art["families"])
    assert not viols, (
        f"{name} records slope-budget violations: {viols} — a scale "
        f"regression shipped; fix the operator (or document a budget "
        f"override in tools/scale_bench.py:SLOPE_BUDGETS) and re-run "
        f"tools/scale_bench.py --families all --assert-budgets"
    )
    # the artifact ALSO persists the violations the runner saw at run
    # time; they must agree with the recomputation above
    assert art.get("violations") == [], art.get("violations")


def test_scale_artifact_covers_every_family_query() -> None:
    found = _newest("SCALE_r{N}.json")
    if found is None or "families" not in found[1]:
        pytest.skip("no family-format SCALE_r{N}.json committed yet")
    name, art = found
    for fam, (mult, queries) in FAMILIES.items():
        fdata = art["families"].get(fam)
        assert fdata is not None, f"{name} missing family {fam}"
        missing = [q for q in queries if q not in fdata["warm_slope"]]
        assert not missing, (
            f"{name} family {fam} missing slopes for {missing} — the "
            f"family list grew without a re-measurement; re-run the "
            f"scale gate"
        )
        assert fdata["mult"] == mult, (fam, fdata["mult"], mult)


def test_recall_artifact_floors() -> None:
    found = _newest("RECALL_r{N}.json")
    if found is None:
        pytest.skip("no RECALL_r{N}.json committed yet")
    name, art = found
    for scale, vals in art["per_scale"].items():
        for key, floor in RECALL_FLOORS.items():
            got = vals.get(key)
            assert got is not None, f"{name} x{scale} missing {key}"
            assert got >= floor, (
                f"{name} x{scale} {key} = {got} below floor {floor} — "
                f"an approximate-search recall regression; re-run "
                f"tools/recall_bench.py and fix the mechanism before "
                f"lowering any floor"
            )


#: Floors for the round-11 capped-recall section (recall UNDER the
#: production bucket caps, over-cap boilerplate block unioned in — see
#: tools/recall_bench._capped_recall). Fixture planted pairs live in
#: small buckets, so the cap must not cost them anything: capped floors
#: equal the uncapped ones.
CAPPED_RECALL_FLOORS = {
    "minhash_exact_pair_recall": 1.0,
    "minhash_neardup_pair_recall": 0.90,
    "minhash_exact_pair_recall_capped": 1.0,
    "minhash_neardup_pair_recall_capped": 0.90,
    "simhash_exact_pair_recall": 1.0,
    "simhash_exact_pair_recall_capped": 1.0,
}


def test_capped_recall_floors_and_engagement() -> None:
    found = _newest("RECALL_r{N}.json")
    if found is None or "capped" not in found[1]:
        pytest.skip("no capped-recall section committed yet (round 11+)")
    name, art = found
    vals = art["capped"]
    for key, floor in CAPPED_RECALL_FLOORS.items():
        got = vals.get(key)
        assert got is not None, f"{name} capped missing {key}"
        assert got >= floor, (
            f"{name} capped {key} = {got} below floor {floor} — the "
            f"production bucket cap is eating recall OUTSIDE degenerate "
            f"buckets; fix the cap plumbing, don't lower the floor"
        )
    # engagement evidence — a green capped run on a corpus whose buckets
    # never reach the cap is an empty-vs-empty comparison (round-10 gate
    # lesson): the augmented corpus must contain over-cap buckets, the
    # natural one must not, and the boilerplate block's banded recall
    # must have actually collapsed (its pairs are recovered by the md5
    # exact path instead — that is the documented trade).
    assert vals["augmented_buckets"]["buckets_over_cap"] > 0, vals
    assert vals["natural_buckets"]["buckets_over_cap"] == 0, vals
    for key in ("minhash_boilerplate_pair_recall_capped",
                "simhash_boilerplate_pair_recall_capped"):
        assert vals[key] <= 0.05, (
            f"{name} {key} = {vals[key]} — the over-cap block paired "
            f"through the band join, so the cap did not engage; the "
            f"measurement is no longer measuring the capped path"
        )


#: Long-document (10k-50k chars) floors — the content-anchored shingle
#: selection's stated value case. A long-doc one-token-edit near-dup has
#: planted Jaccard ≈ 0.999 (16 of ~20k shingles differ), so banded
#: recall should be ~1; a drop here means anchor selection broke on long
#: texts, not banding probability.
LONGDOCS_RECALL_FLOORS = {
    "minhash_exact_pair_recall": 1.0,
    "minhash_neardup_pair_recall": 0.95,
}


def test_longdocs_recall_floors() -> None:
    found = _newest("RECALL_r{N}.json")
    if found is None or "longdocs" not in found[1]:
        pytest.skip("no longdocs section committed yet (round 11+)")
    name, art = found
    vals = art["longdocs"]
    for key, floor in LONGDOCS_RECALL_FLOORS.items():
        got = vals.get(key)
        assert got is not None, f"{name} longdocs missing {key}"
        assert got >= floor, (
            f"{name} longdocs {key} = {got} below floor {floor}"
        )
