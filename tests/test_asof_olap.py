"""As-of join semantics + OLAP surface sanity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_asof_join_semantics(spark):
    from financial_big_data_exp_4_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, 100, 50),   # probe at t=50: payloads at 10,40 → take 40's
            (2, 100, 10),   # probe exactly at payload ts → included
            (3, 100, 5),    # before any payload → NULL
            (4, 200, 99),   # key with no payloads at all → NULL
        ],
        "probe_id long, k long, t long",
    )
    right = spark.createDataFrame(
        [
            (11, 100, 10, 1.5),
            (12, 100, 40, 2.5),
            (13, 100, 60, 9.9),  # after every probe → never picked
        ],
        "rid long, k long, t long, v double",
    )
    out = {
        r["probe_id"]: r["asof_value"]
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="t",
            payload="v", tiebreak="rid",
        ).collect()
    }
    assert out == {1: 2.5, 2: 1.5, 3: None, 4: None}


def test_asof_join_tie_takes_latest_by_tiebreak(spark):
    from financial_big_data_exp_4_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 7, 100)], "probe_id long, k long, t long")
    right = spark.createDataFrame(
        [(21, 7, 100, 1.0), (22, 7, 100, 2.0)],
        "rid long, k long, t long, v double",
    )
    out = asof_join(
        left, right, key="k", left_ts="t", right_ts="t",
        payload="v", tiebreak="rid",
    ).collect()
    assert out[0]["asof_value"] == 2.0  # max tiebreak wins, deterministic


def test_asof_join_string_tiebreak(spark):
    """The tiebreak rides in its native type: a string uuid must neither
    crash (ANSI cast) nor silently NULL out (non-ANSI cast-to-long would
    destroy tie determinism)."""
    from financial_big_data_exp_4_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 7, 100)], "probe_id long, k long, t long")
    right = spark.createDataFrame(
        [("uuid-aa", 7, 100, 1.0), ("uuid-zz", 7, 100, 2.0)],
        "rid string, k long, t long, v double",
    )
    out = asof_join(
        left, right, key="k", left_ts="t", right_ts="t",
        payload="v", tiebreak="rid",
    ).collect()
    assert out[0]["asof_value"] == 2.0  # max string tiebreak wins


def test_rollup_totals_consistent(spark, sf_dir):
    from financial_big_data_exp_4_spark.plans.extensions import q_rollup

    rows = q_rollup(spark, sf_dir).collect()
    grand = [r for r in rows if r["o_orderpriority"] is None and r["o_orderstatus"] is None]
    leaves = [r for r in rows if r["o_orderpriority"] is not None and r["o_orderstatus"] is not None]
    assert len(grand) == 1
    assert grand[0]["cnt"] == sum(r["cnt"] for r in leaves)
    assert abs(grand[0]["revenue"] - sum(r["revenue"] for r in leaves)) < 1e-6


def test_cube_and_grouping_sets_consistent(spark, sf_dir):
    from financial_big_data_exp_4_spark.plans.extensions import (
        q_cube,
        q_grouping_sets,
    )

    cube = q_cube(spark, sf_dir).collect()
    # cube ⊇ rollup: per-status marginals exist with NULL priority
    status_marginals = [
        r for r in cube
        if r["o_orderpriority"] is None and r["o_orderstatus"] is not None
    ]
    assert status_marginals
    gs = q_grouping_sets(spark, sf_dir).collect()
    # gid tags which column survived: 1 = (priority), 2 = (status)
    assert {r["gid"] for r in gs} == {1, 2}
    by_status = {
        r["o_orderstatus"]: r["cnt"] for r in gs if r["gid"] == 2
    }
    for r in status_marginals:
        assert by_status[r["o_orderstatus"]] == r["cnt"]


def test_approx_count_distinct_tracks_exact(spark, sf_dir):
    """The documented 100 TB swap for COUNT(DISTINCT): HLL sketch, one
    pass, mergeable. Default rsd=0.05 — assert the estimate lands within
    a loose 3×rsd of the exact count on the fixture."""
    from pyspark.sql import functions as F

    from financial_big_data_exp_4_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    row = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id").alias("approx"),
    ).head()
    assert row["approx"] > 0
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.15 * row["exact"])


def test_asof_join_null_payload_is_not_skipped(spark):
    """The carried value is the latest right ROW's payload — a right row
    whose payload is legitimately NULL must yield NULL, not the stale
    older non-null value (the struct-presence wrap under the
    ignorenulls mechanism)."""
    from financial_big_data_exp_4_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100)], "probe_id long, k long, ts long"
    )
    right = spark.createDataFrame(
        [(7, 10, 1, 5.0), (8, 10, 5, None)],
        "rid long, k long, ts long, val double",
    )
    got = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        payload="val", tiebreak="rid", payload_out="v",
    ).collect()
    assert len(got) == 1 and got[0]["v"] is None


def test_hopping_counts_every_event_in_two_aligned_windows(spark):
    from pyspark.sql import functions as F

    from financial_big_data_exp_4_spark.operators.events import (
        hopping_counts,
    )

    # events at -30 min (pre-epoch!), 10 min, 40 min, 70 min
    rows = [(i, t * 60 * 1_000_000_000, "e") for i, t in
            enumerate([-30, 10, 40, 70])]
    ev = spark.createDataFrame(rows, "event_id long, ts long, event_type string")
    got = {
        (r.window_start_s, r.cnt)
        for r in hopping_counts(ev).collect()
    }
    # window starts each event falls in (width 3600, hop 1800):
    # -30min -> starts -3600 and -1800; 10min -> -1800 and 0;
    # 40min -> 0 and 1800; 70min -> 1800 and 3600
    assert got == {(-3600, 1), (-1800, 2), (0, 2), (1800, 2), (3600, 1)}


def test_hopping_counts_rejects_non_dividing_hop(spark):
    import pytest

    from financial_big_data_exp_4_spark.operators.events import (
        hopping_counts,
    )

    ev = spark.createDataFrame([], "event_id long, ts long, event_type string")
    with pytest.raises(ValueError):
        hopping_counts(ev, width_sec=3600, hop_sec=1000)


def test_quantize_embeddings_codes_and_bound(spark):
    from financial_big_data_exp_4_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 0.5]),       # exact endpoints + midpoint
            (2, [3.25, 3.25, 3.25]),    # constant vector: scale 0
            (3, [-2.0, 2.0]),           # negative range
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    # endpoints map to 0/255, midpoint to round(127.5+0.5)=128
    assert (rows[1].q_lo, rows[1].q_hi) == (0, 255)
    assert rows[1].q_sum == 0 + 255 + 128
    assert rows[1].recon_ok
    # scale-0 convention: every code 0, reconstruction exact
    assert (rows[2].q_lo, rows[2].q_hi, rows[2].q_sum) == (0, 0, 0)
    assert rows[2].recon_ok
    assert (rows[3].q_lo, rows[3].q_hi) == (0, 255)
    assert rows[3].recon_ok
    assert all(r.n_dims == len(e) for r, e in
               [(rows[1], [0] * 3), (rows[3], [0] * 2)])
