"""Tests for the round-3 pipeline operators: MERGE apply, SCD Type-2,
winsorization, document chunking, BM25, hyperplane LSH."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from financial_big_data_exp_4_spark.operators.corpus import (
    CHUNK_OVERLAP,
    CHUNK_WIDTH,
    bm25_scores,
    chunk_documents,
)
from financial_big_data_exp_4_spark.operators.relational import (
    hash_sample,
    merge_changes,
    scd2_intervals,
    snapshot_diff,
    standard_scale,
    winsorize,
)
from financial_big_data_exp_4_spark.operators.similarity import (
    LSH_PLANES,
    hyperplane_signatures,
)
from financial_big_data_exp_4_spark.sources import load_table


def test_merge_changes_semantics(spark):
    base = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C")],
        "k long, price double, status string",
    )
    changes = spark.createDataFrame(
        [
            (2, "U", 99.0, "B2"),   # update existing
            (3, "D", None, None),    # delete existing
            (7, "I", 70.0, "N"),     # insert new key
        ],
        "k long, op string, price double, status string",
    )
    out = {
        r["k"]: (r["price"], r["status"])
        for r in merge_changes(
            base, changes, key="k", cols=("price", "status")
        ).collect()
    }
    assert out == {1: (10.0, "A"), 2: (99.0, "B2"), 7: (70.0, "N")}


def test_merge_changes_contract_violations(spark):
    """Hardening (round-3 ADVICE): duplicate keys in the change set must
    not fan out base rows (D > U wins deterministically), and a matched
    'I' resolves as a replace — never a silent drop or a duplicate."""
    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    changes = spark.createDataFrame(
        [
            (1, "U", 11.0),  # dup key: U ...
            (1, "D", None),  # ... and D → D wins, row deleted once
            (2, "I", 22.0),  # matched 'I' → replace, exactly one row
            (4, "I", 40.0),  # dup inserts collapse to one row
            (4, "I", 44.0),  # (greatest payload wins)
        ],
        "k long, op string, v double",
    )
    rows = merge_changes(base, changes, key="k", cols=("v",)).collect()
    assert len(rows) == 3  # no fan-out, no duplicate keys
    out = {r["k"]: r["v"] for r in rows}
    assert out == {2: 22.0, 3: 30.0, 4: 44.0}


def test_merge_changes_upsert_and_sequence(spark):
    """Upsert-U + last-writer-wins: an I-then-U batch for a NEW key must
    survive as an insert with the final payload (update-only semantics
    silently lost the row), and with a sequence column a D-then-I
    re-insert resolves to the later I instead of the priority-ranked D."""
    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    # no sequence: I-then-U on new key 50 -> U wins by priority, but the
    # key is absent from base, so upsert-U must INSERT the final payload
    iu = spark.createDataFrame(
        [(50, "I", 500.0), (50, "U", 555.0)],
        "k long, op string, v double",
    )
    out = {
        r["k"]: r["v"]
        for r in merge_changes(base, iu, key="k", cols=("v",)).collect()
    }
    assert out == {1: 10.0, 2: 20.0, 50: 555.0}

    # with a sequence column: delete-then-reinsert keeps the LATER insert
    # (last-writer-wins), where the priority fallback keeps the delete
    di = spark.createDataFrame(
        [(2, "D", None, 1), (2, "I", 222.0, 2)],
        "k long, op string, v double, seq long",
    )
    with_seq = {
        r["k"]: r["v"]
        for r in merge_changes(
            base, di, key="k", cols=("v",), seq_col="seq"
        ).collect()
    }
    assert with_seq == {1: 10.0, 2: 222.0}
    without_seq = {
        r["k"]: r["v"]
        for r in merge_changes(
            base, di.drop("seq"), key="k", cols=("v",)
        ).collect()
    }
    assert without_seq == {1: 10.0}


def test_scd2_intervals_versions_and_validity(spark):
    # user 1: A A B A  → versions A[0,2) B[2,3) A[3,∞); user 2: one event
    rows = [
        (1, 10, 0, "A"),
        (1, 11, 1, "A"),
        (1, 12, 2, "B"),
        (1, 13, 3, "A"),
        (2, 20, 5, "X"),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s long, event_type string"
    )
    got = {
        (r["user_id"], r["version"]): (
            r["event_type"],
            r["valid_from_s"],
            r["valid_to_s"],
            r["n_events"],
        )
        for r in scd2_intervals(events).collect()
    }
    assert got == {
        (1, 1): ("A", 0, 2, 2),
        (1, 2): ("B", 2, 3, 1),
        (1, 3): ("A", 3, None, 1),
        (2, 1): ("X", 5, None, 1),
    }


def test_winsorize_clips_and_flags(spark):
    rows = [("g", float(v)) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, group="g", value="v", lo=0.05, hi=0.95).collect()
    lo = out[0]["lo_bound"]
    hi = out[0]["hi_bound"]
    # exact interpolated percentiles of 1..100
    assert lo == pytest.approx(5.95) and hi == pytest.approx(95.05)
    for r in out:
        assert r["v_clipped"] == min(max(r["v"], lo), hi)
        assert r["was_clipped"] == (r["v"] < lo or r["v"] > hi)
    assert sum(r["was_clipped"] for r in out) == 10


def test_winsorize_null_value_stays_null(spark):
    """Spark's least/greatest SKIP NULL arguments, so an unguarded clip
    fabricates the lower bound for a NULL value — NULL must stay NULL
    with was_clipped False (missing data is not an outlier)."""
    rows = [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["v"]: r for r in winsorize(df, "g", "v", 0.25, 0.75).collect()}
    assert out[None]["v_clipped"] is None
    assert out[None]["was_clipped"] is False
    assert out[1.0]["v_clipped"] == out[1.0]["lo_bound"]  # real clip intact


def test_standard_scale_ignores_null_values_in_moments(spark):
    """sum() skips NULLs, so n must be count(value) not count(*): with a
    NULL in the group the non-null moments are mean=2.0, pop-std over
    [1,2,3] — a row-count denominator would bias both."""
    import math

    rows = [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["v"]: r for r in standard_scale(df, "g", "v").collect()}
    assert out[1.0]["group_mean"] == pytest.approx(2.0)
    assert out[1.0]["group_std"] == pytest.approx(math.sqrt(2.0 / 3.0))
    assert out[None]["v_scaled"] is None


def test_snapshot_diff_null_key_is_matched_null_safe(spark):
    """A NULL-key row identical in both snapshots is unchanged — a plain
    equi-join would misreport it as one added plus one removed."""
    old = spark.createDataFrame([(None, 7.0), (1, 1.0)], "k long, v double")
    new = spark.createDataFrame([(None, 7.0), (1, 2.0)], "k long, v double")
    got = {
        r["diff_class"]: r["n_keys"]
        for r in snapshot_diff(old, new, key="k", cols=("v",)).collect()
    }
    assert got == {"unchanged": 1, "changed": 1}


def test_chunk_documents_covers_text_with_overlap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    lens = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    chunks = chunk_documents(docs).collect()
    step = CHUNK_WIDTH - CHUNK_OVERLAP
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(lens)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["start"])
        starts = [r["start"] for r in rs]
        assert starts == list(range(1, max(lens[doc_id] - CHUNK_OVERLAP, 1) + 1, step))
        # consecutive chunks overlap; the final chunk reaches the text end
        assert rs[-1]["start"] + rs[-1]["chunk_len"] - 1 == lens[doc_id]
        for a, b in zip(rs, rs[1:]):
            assert b["start"] <= a["start"] + CHUNK_WIDTH - 1
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))


def test_chunk_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    [r] = chunk_documents(docs).collect()
    assert (r["chunk_idx"], r["start"], r["chunk_len"]) == (0, 1, 2)


def test_bm25_rank_and_saturation(spark):
    # tf saturation: doc with tf=4 beats tf=1 at equal dl; rank per term
    docs = spark.createDataFrame(
        [
            (1, "join join join join pad pad pad pad"),
            (2, "join pad pad pad pad pad pad pad"),
            (3, "nothing relevant here at all pad pad pad"),
        ],
        "doc_id long, text string",
    )
    out = bm25_scores(docs, terms=("join",), k=5).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]
    scores = {r["doc_id"]: r["bm25"] for r in out}
    assert scores[1] > scores[2] > 0
    # saturation: quadrupling tf must NOT quadruple the score
    assert scores[1] < 4 * scores[2]


def test_hyperplane_signatures_deterministic_16bit(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    a = {r["vec_id"]: r["sig"] for r in hyperplane_signatures(emb).collect()}
    b = {r["vec_id"]: r["sig"] for r in hyperplane_signatures(emb).collect()}
    assert a == b  # derived planes: bit-reproducible
    assert all(0 <= s < (1 << LSH_PLANES) for s in a.values())
    # signatures must actually discriminate (not constant)
    assert len(set(a.values())) > 1


def test_hyperplane_similar_vectors_collide(spark):
    # a vector and a tiny perturbation of it share all 16 sign bits;
    # its negation flips every bit
    base = [float((i * 37) % 19 - 9) for i in range(64)]
    near = [v + 0.001 for v in base]
    neg = [-v for v in base]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, neg)],
        "vec_id long, embedding array<float>",
    )
    sigs = {
        r["vec_id"]: r["sig"] for r in hyperplane_signatures(df).collect()
    }
    assert sigs[1] == sigs[2]
    assert sigs[1] ^ sigs[3] == (1 << LSH_PLANES) - 1


def test_funnel_strict_order(spark):
    # u1 completes the funnel; u2 clicks before viewing (breaks stage 2);
    # u3 views only
    rows = [
        (1, "view", 1_000_000_000),
        (1, "click", 2_000_000_000),
        (1, "purchase", 3_000_000_000),
        (2, "click", 1_000_000_000),
        (2, "view", 2_000_000_000),
        (2, "purchase", 3_000_000_000),
        (3, "view", 1_000_000_000),
    ]
    from financial_big_data_exp_4_spark.operators.events import funnel_counts

    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long"
    )
    got = {
        r["stage"]: r["n_users"] for r in funnel_counts(events).collect()
    }
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_cohort_retention_offsets(spark):
    from financial_big_data_exp_4_spark.operators.events import (
        cohort_retention,
    )

    day_ns = 86_400_000_000_000
    rows = [
        (1, 0 * day_ns), (1, 0 * day_ns), (1, 2 * day_ns),  # cohort 0
        (2, 0 * day_ns),                                     # cohort 0
        (3, 1 * day_ns), (3, 2 * day_ns),                    # cohort 1
    ]
    events = spark.createDataFrame(rows, "user_id long, ts long")
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in cohort_retention(events).collect()
    }
    assert got == {(0, 0): 2, (0, 2): 1, (1, 0): 1, (1, 1): 1}


def test_profile_columns_counts(spark):
    from financial_big_data_exp_4_spark.operators.relational import (
        profile_columns,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "k long, s string"
    )
    got = {
        r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
        for r in profile_columns(df, cols=("k", "s")).collect()
    }
    assert got == {"k": (4, 0, 4), "s": (4, 1, 2)}


def test_snapshot_diff_classes(spark):
    from financial_big_data_exp_4_spark.operators.relational import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (4, 40.0)], "k long, v double"
    )
    got = {
        r["diff_class"]: r["n_keys"]
        for r in snapshot_diff(old, new, key="k", cols=("v",)).collect()
    }
    # key 3 removed (NULL payload still counts as present), 4 added
    assert got == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_funnel_empty_input_total(spark):
    from financial_big_data_exp_4_spark.operators.events import funnel_counts

    events = spark.createDataFrame(
        [], "user_id long, event_type string, ts long"
    )
    got = {r["stage"]: r["n_users"] for r in funnel_counts(events).collect()}
    assert got == {"view": 0, "click": 0, "purchase": 0}


def test_hyperplane_pairs_pigeonhole_and_verify(spark, sf_dir):
    """Every pair within Hamming ≤ 1 (bands−1) must appear among the
    banded candidates, and candidate cosine must equal the exact value."""
    from financial_big_data_exp_4_spark.operators.similarity import (
        cosine,
        hyperplane_neardup_pairs,
        hyperplane_signatures,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    sigs = {r["vec_id"]: r["sig"] for r in hyperplane_signatures(emb).collect()}
    cands = {
        (r["vec_a"], r["vec_b"]): (r["hamming"], r["cos_sim"])
        for r in hyperplane_neardup_pairs(emb).collect()
    }
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham <= 1:
                assert (a, b) in cands
                assert cands[(a, b)][0] == ham
    # exact-cosine verify on a few candidates
    some = list(cands)[:5]
    if some:
        pairs_df = spark.createDataFrame(
            [(a, b) for a, b in some], "vec_a long, vec_b long"
        )
        e = emb.select(
            F.col("vec_id"), F.col("embedding")
        )
        joined = (
            pairs_df.join(e.withColumnRenamed("vec_id", "vec_a")
                          .withColumnRenamed("embedding", "ea"), "vec_a")
            .join(e.withColumnRenamed("vec_id", "vec_b")
                   .withColumnRenamed("embedding", "eb"), "vec_b")
            .select("vec_a", "vec_b", cosine(F.col("ea"), F.col("eb")).alias("c"))
        )
        for r in joined.collect():
            assert cands[(r["vec_a"], r["vec_b"])][1] == r["c"]


# -- property tests (hypothesis): operator ≡ Python reference model --------

from hypothesis import given, settings
from hypothesis import strategies as st

_ops = st.sampled_from(["U", "D", "I"])


@settings(max_examples=15, deadline=None)
@given(
    base_keys=st.sets(st.integers(0, 20), max_size=8),
    change_list=st.lists(
        st.tuples(st.integers(0, 30), _ops, st.integers(-5, 5)),
        max_size=8,
        unique_by=lambda t: t[0],
    ),
)
def test_merge_changes_matches_model(spark, base_keys, change_list):
    """merge_changes ≡ a dict-model MERGE for any disjoint-op change set
    (CDC contract: 'I' keys are new, 'U'/'D' keys exist in the base)."""
    changes = [
        (k, op, v)
        for k, op, v in change_list
        if (op == "I") != (k in base_keys)
    ]
    model = {k: float(k * 10) for k in base_keys}
    for k, op, v in changes:
        if op == "U":
            model[k] = float(v)
        elif op == "D":
            model.pop(k)
        else:
            model[k] = float(v)
    base_df = spark.createDataFrame(
        [(k, float(k * 10)) for k in sorted(base_keys)] or [],
        "k long, v double",
    )
    ch_df = spark.createDataFrame(
        [(k, op, float(v)) for k, op, v in changes] or [],
        "k long, op string, v double",
    )
    got = {
        r["k"]: r["v"]
        for r in merge_changes(base_df, ch_df, key="k", cols=("v",)).collect()
    }
    assert got == model


@settings(max_examples=15, deadline=None)
@given(
    history=st.lists(
        st.sampled_from(["A", "B", "C", None]), min_size=1, max_size=10
    )
)
def test_scd2_matches_fold_model(spark, history):
    """scd2_intervals ≡ a sequential fold over one user's history,
    including NULL attribute states (IS DISTINCT FROM change test)."""
    rows = [(1, i, i * 10, a) for i, a in enumerate(history)]
    events = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s long, event_type string"
    )
    # reference fold
    expected = []
    for i, a in enumerate(history):
        if i == 0 or history[i - 1] != a:
            expected.append([a, i * 10, None, 1])  # attr, from, to, n
        else:
            expected[-1][3] += 1
    for prev, nxt in zip(expected, expected[1:]):
        prev[2] = nxt[1]
    got = sorted(
        (
            r["version"],
            r["event_type"],
            r["valid_from_s"],
            r["valid_to_s"],
            r["n_events"],
        )
        for r in scd2_intervals(events).collect()
    )
    assert got == [
        (i + 1, a, f, t, n) for i, (a, f, t, n) in enumerate(expected)
    ]


@settings(max_examples=15, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=400,
    )
)
def test_chunk_documents_properties_random_text(spark, text):
    """Chunk cover/overlap invariants on arbitrary printable text."""
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rs = sorted(chunk_documents(docs).collect(), key=lambda r: r["start"])
    step = CHUNK_WIDTH - CHUNK_OVERLAP
    L = len(text)
    assert [r["start"] for r in rs] == list(
        range(1, max(L - CHUNK_OVERLAP, 1) + 1, step)
    )
    # full coverage: last chunk ends at the text end
    assert rs[-1]["start"] + rs[-1]["chunk_len"] - 1 == L
    # chunk lengths: all but the last are full width (when text is long)
    for r in rs[:-1]:
        assert r["chunk_len"] == CHUNK_WIDTH


@settings(max_examples=10, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 4),            # user
            st.sampled_from(["view", "click", "purchase", "error"]),
            st.integers(0, 20),           # time (µs scale irrelevant)
        ),
        max_size=24,
    )
)
def test_funnel_matches_model(spark, events):
    """funnel_counts ≡ a brute-force first-touch model on random events
    (ties at equal first-touch times break the strict ascent)."""
    from financial_big_data_exp_4_spark.operators.events import funnel_counts

    rows = [(u, t, ts * 1000) for u, t, ts in events]  # ns with µs grain
    df = spark.createDataFrame(
        rows or [], "user_id long, event_type string, ts long"
    )
    stages = ("view", "click", "purchase")
    per_user: dict[int, dict[str, int]] = {}
    for u, t, ts in events:
        if t in stages:
            d = per_user.setdefault(u, {})
            d[t] = min(d.get(t, ts), ts)
    expect = {s: 0 for s in stages}
    for d in per_user.values():
        for i, s in enumerate(stages):
            needed = stages[: i + 1]
            if all(x in d for x in needed) and all(
                d[a] < d[b] for a, b in zip(needed, needed[1:])
            ):
                expect[s] += 1
    got = {r["stage"]: r["n_users"] for r in funnel_counts(df).collect()}
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-10000, 10000)),
        min_size=2,
        max_size=30,
    )
)
def test_standard_scale_matches_exact_model(spark, vals):
    """standard_scale ≡ a Python model that mirrors the engine's own
    arithmetic: decimal sums are exact rationals, the decimal→double
    casts are correctly rounded (float(Fraction) rounds identically to
    the JVM cast), and the closed-form combination then proceeds in
    IEEE double with the same association — so every output is
    bit-equal, including the catastrophic-cancellation regime where a
    constant group's variance term rounds to a tiny nonzero."""
    from fractions import Fraction as Fr
    import math

    from financial_big_data_exp_4_spark.operators.relational import (
        standard_scale,
    )

    rows = [(g, v / 100.0) for g, v in vals]
    df = spark.createDataFrame(rows, "g int, v double")
    by_g: dict[int, list] = {}
    for g, v in vals:
        by_g.setdefault(g, []).append(Fr(v, 100))
    out = standard_scale(df, group="g", value="v").collect()
    assert len(out) == len(vals)
    for r in out:
        xs = by_g[r["g"]]
        n = float(len(xs))
        sx = float(sum(xs))            # correctly-rounded decimal→double
        sxx = float(sum(x * x for x in xs))
        mean = sx / n
        std = math.sqrt(max((n * sxx - sx * sx) / (n * n), 0.0))
        assert r["group_mean"] == mean
        assert r["group_std"] == std
        if std > 0.0:
            assert r["v_scaled"] == (r["v"] - mean) / std
        else:
            assert r["v_scaled"] is None


def test_hash_bucketing_sign_safe(spark):
    """Negative keys must bucket into [0, N) like positive ones — a
    dividend-signed %% would give negative buckets that pass every
    `bucket < rate` filter (0%% samples returning 100%% of negative-key
    rows)."""
    from financial_big_data_exp_4_spark.functions.core import det_hash_mod
    from financial_big_data_exp_4_spark.operators.corpus import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(k,) for k in (-7, -5, -1, 0, 3)], "k long"
    )
    buckets = [
        r["b"] for r in df.select(det_hash_mod("k", 100).alias("b")).collect()
    ]
    assert all(0 <= b < 100 for b in buckets)
    assert hash_sample(df, key="k", pct=0).count() == 0
    assert hash_sample(df, key="k", pct=100).count() == 5

    ev = spark.createDataFrame(
        [(-3, "view"), (-9, "ghost"), (4, "view")],
        "event_id long, event_type string",
    )
    kept = stratified_sample(
        ev, key="event_id", stratum="event_type", rates_permille={"view": 0}
    )
    assert kept.count() == 0  # rate-0 and unknown strata drop ALL rows


@settings(max_examples=15, deadline=None)
@given(
    base_keys=st.sets(st.integers(0, 10), max_size=5),
    change_list=st.lists(
        st.tuples(st.integers(0, 15), _ops, st.integers(-5, 5)),
        max_size=10,
    ),
)
def test_merge_changes_seq_matches_ordered_model(
    spark, base_keys, change_list
):
    """With a sequence column, merge_changes ≡ applying the change log
    in sequence order to a dict — last-writer-wins upsert semantics,
    including duplicate keys, I-then-U on new keys, and D-then-I
    re-inserts (the cases priority-only resolution cannot express)."""
    model = {k: float(k * 10) for k in base_keys}
    for k, op, v in change_list:  # list order IS the sequence
        if op == "D":
            model.pop(k, None)
        else:  # U and I are both upserts
            model[k] = float(v)
    base_df = spark.createDataFrame(
        [(k, float(k * 10)) for k in sorted(base_keys)] or [],
        "k long, v double",
    )
    ch_df = spark.createDataFrame(
        [
            (k, op, float(v), i)
            for i, (k, op, v) in enumerate(change_list)
        ]
        or [],
        "k long, op string, v double, seq long",
    )
    got = {
        r["k"]: r["v"]
        for r in merge_changes(
            base_df, ch_df, key="k", cols=("v",), seq_col="seq"
        ).collect()
    }
    assert got == model


def test_hyperplane_pairs_bucket_cap(spark):
    """The corpus-scale escape hatch: a degenerate corpus where many
    vectors share one band bucket must stop pairing once the bucket
    exceeds max_bucket_size, while small buckets keep their pairs
    (round-7 scale measurement: fixed-width bands grow quadratically
    without it)."""
    from financial_big_data_exp_4_spark.operators.similarity import (
        hyperplane_neardup_pairs,
    )

    # 40 near-identical vectors: one giant bucket in every band
    base = [float((i * 37) % 19 - 9) for i in range(64)]
    rows = [(i, [v + i * 1e-6 for v in base]) for i in range(1, 41)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    uncapped = hyperplane_neardup_pairs(emb).count()
    capped = hyperplane_neardup_pairs(emb, max_bucket_size=10).count()
    assert uncapped == 40 * 39 // 2  # clique
    assert capped == 0  # every band bucket over-full → dropped

    # mixed corpus: the giant cluster is capped away, the small pair
    # (negated direction → its own bucket) survives
    neg = [(100, [-v for v in base]), (101, [-v - 1e-6 for v in base])]
    emb2 = spark.createDataFrame(
        rows + neg, "vec_id long, embedding array<float>"
    )
    kept = hyperplane_neardup_pairs(emb2, max_bucket_size=10).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in kept} == {(100, 101)}


def test_exact_percentiles_bitwise_equals_percentile_aggregate(spark):
    """exact_percentiles' contract is BIT-identity with F.percentile
    (the differential harness compares repr(double), so even a 1-ULP
    formula drift is a real divergence). Randomized groups/sizes/values
    including negative values, duplicates, a NULL-bearing group, and an
    all-NULL group (the aggregate emits the group with NULL — so must
    the sort-based form)."""
    import random
    import struct

    from financial_big_data_exp_4_spark.operators.relational import (
        exact_percentiles,
    )

    random.seed(1207)
    rows = []
    for g in range(8):
        n = random.choice([1, 2, 3, 7, 45, 200])
        for _ in range(n):
            v = random.choice(
                [round(random.uniform(-1e6, 1e6), 2),
                 random.uniform(-1e6, 1e6),
                 float(random.randint(-5, 5))]
            )
            rows.append((f"g{g}", v))
    rows += [("gnull", None)] * 4                  # all-NULL group
    rows += [("gmix", None), ("gmix", 3.25), ("gmix", -7.5)]
    df = spark.createDataFrame(rows, "g string, v double")
    ps = {"p05": 0.05, "p25": 0.25, "p50": 0.5, "p777": 0.777, "p95": 0.95}
    got = {
        r["g"]: tuple(r[k] for k in ps)
        for r in exact_percentiles(df, "g", "v", ps).collect()
    }
    want = {
        r["g"]: tuple(r[k] for k in ps)
        for r in df.groupBy("g")
        .agg(*[F.percentile(F.col("v"), F.lit(p)).alias(k)
               for k, p in ps.items()])
        .collect()
    }
    assert set(got) == set(want)
    for g in want:
        for a, b in zip(got[g], want[g]):
            if a is None or b is None:
                assert a is None and b is None, (g, a, b)
            else:
                assert struct.pack("d", a) == struct.pack("d", b), (g, a, b)


def test_profile_columns_approx_mode(spark):
    """approx=True (the 100 TB knob, round-12 VERDICT #7): same schema
    and row set as the exact profile, NULL counts identical (exact in
    both modes), and HLL++ distinct estimates within the documented
    default rsd (5%, take 3σ ≈ 15% slack) of the exact counts — plus the
    plan-shape point of the knob: no Expand operator."""
    from pyspark.sql import functions as F

    from financial_big_data_exp_4_spark.operators.relational import (
        profile_columns,
    )

    df = spark.range(5_000).select(
        F.col("id"),
        (F.col("id") % 97).alias("mod97"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") % 7)
        .alias("mod7_nullable"),
    )
    cols = ("id", "mod97", "mod7_nullable")
    exact = {r.column: r for r in profile_columns(df, cols).collect()}
    approx = {
        r.column: r for r in profile_columns(df, cols, approx=True).collect()
    }
    assert set(exact) == set(approx) == set(cols)
    for c in cols:
        assert approx[c].n_rows == exact[c].n_rows == 5_000
        assert approx[c].n_nulls == exact[c].n_nulls
        nd_exact, nd_approx = exact[c].n_distinct, approx[c].n_distinct
        assert abs(nd_approx - nd_exact) <= max(1, 0.15 * nd_exact), c
    plan = (
        profile_columns(df, cols, approx=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan
    # r15: the exact path is per-column union branches now — no Expand
    # row blow-up there either (measured 1.8x at the 10x fixture), and
    # one aggregate branch per profiled column
    exact_plan = (
        profile_columns(df, cols)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in exact_plan
    assert exact_plan.count("Union") == 1
