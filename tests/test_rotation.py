"""Mechanical guard for the driver-sample alternation policy.

The external driver's correctness gate samples the FIRST 50 entries of
``REFERENCE_QUERIES`` each round, and the standing policy (round-5 VERDICT
prescription #2) is to swap that prefix to the complement half every round so
all 98 declared queries get a fresh external verdict every two rounds.

Rounds 2-4 silently re-sampled the same half because the swap was manual and
forgotten.  This test makes the rotation loud: it reads the most recent
committed ``CORRECTNESS_r{N}.json`` (the previous round's actual driver
sample) and fails if the current prefix substantially matches it — i.e. the
swap was forgotten.  A small overlap is allowed for the two standing anchors
(q_scan, q_feature_pipeline) that stay in every round's sample.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from financial_big_data_exp_4_spark.plans import REFERENCE_QUERIES

REPO_ROOT = Path(__file__).resolve().parent.parent
#: Overlap budget between consecutive rounds' 50-query driver samples.
#: The two standing anchors give overlap 2; anything beyond ~1/4 of the
#: sample means the prefix was not actually rotated.
MAX_OVERLAP = 12


def _latest_correctness() -> tuple[int, Path] | None:
    best: tuple[int, Path] | None = None
    for p in REPO_ROOT.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, p)
    return best


def test_sample_prefix_is_exactly_50() -> None:
    prefix = list(REFERENCE_QUERIES)[:50]
    assert len(prefix) == 50
    assert len(set(prefix)) == 50


def test_sample_prefix_rotated_since_last_round() -> None:
    latest = _latest_correctness()
    if latest is None:
        pytest.skip("no committed CORRECTNESS_r*.json yet (round 1)")
    round_no, path = latest
    prev_sample = {k for k in json.load(path.open()) if k.startswith("q_")}
    if not prev_sample:
        pytest.skip(f"{path.name} carries no per-query rows")
    current_prefix = set(list(REFERENCE_QUERIES)[:50])
    overlap = current_prefix & prev_sample
    assert len(overlap) <= MAX_OVERLAP, (
        f"driver-sample prefix overlaps round {round_no}'s sample on "
        f"{len(overlap)}/50 queries — the alternation swap in "
        f"plans/__init__.py:_SAMPLE_FIRST was forgotten. Replace it with "
        f"the complement of {path.name}'s keys (plus the two anchors)."
    )


def test_prev_round_sample_still_declared() -> None:
    """Every query the driver verified last round must still exist.

    A rename would silently drop a query's external verdict history; force
    the rename to be acknowledged here.
    """
    latest = _latest_correctness()
    if latest is None:
        pytest.skip("no committed CORRECTNESS_r*.json yet (round 1)")
    _, path = latest
    prev_sample = {k for k in json.load(path.open()) if k.startswith("q_")}
    missing = prev_sample - set(REFERENCE_QUERIES)
    assert not missing, (
        f"queries verified in {path.name} no longer declared: {sorted(missing)}"
    )


def test_memo_registry_matches_call_sites() -> None:
    """MEMO_FAMILY_CONSUMERS is bench.py's single source of truth for
    cold-cost accounting; a memo_df call site without a registry entry
    would silently hide a family's build cost from the bench artifact."""
    import inspect
    import re

    from financial_big_data_exp_4_spark.plans import extensions

    src = inspect.getsource(extensions)
    # memo_df keys are the ("<name>", sf_dir) tuples in this module
    call_site_keys = set(re.findall(r'\(\s*"([a-z0-9_]+)",\s*sf_dir\s*\)', src))
    assert call_site_keys == set(extensions.MEMO_FAMILY_CONSUMERS), (
        "memo_df call sites and MEMO_FAMILY_CONSUMERS diverged: "
        f"sites-only={sorted(call_site_keys - set(extensions.MEMO_FAMILY_CONSUMERS))} "
        f"registry-only={sorted(set(extensions.MEMO_FAMILY_CONSUMERS) - call_site_keys)}"
    )
    consumers = {
        q for fam in extensions.MEMO_FAMILY_CONSUMERS.values() for q in fam
    }
    assert consumers <= set(REFERENCE_QUERIES), (
        sorted(consumers - set(REFERENCE_QUERIES))
    )
